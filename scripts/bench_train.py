"""Training-benchmark artifact: time-per-epoch for the reference's own
headline benchmark table (README.md:151-153 — 3-layer MLP / LeNet-style
ConvNet on MNIST at batch 256, 1-layer Transformer d=512/h=4 on CoLA at
batch 64), measured end-to-end on the chip.

The README's epoch rows (~0.6 s MLP / ~0.8 s LeNet / 0.113 s CoLA) were
calm-window sessions; this pins them with a driver-visible artifact the
way SERVEBENCH/QUANTBENCH pin the serving/quant rows.

Methodology:
* same models and train steps as ``examples/pydynet/{mnist,transformer}.py``
  (imported, not copied), `pdn.jit(...).foreach` epoch fusion with
  device-resident data — exactly what a user of the examples runs on TPU;
* an epoch is the full reference workload: MNIST 80k samples -> 313 full
  batches of 256 (80,128 >= 80,000), CoLA 8,551 samples -> 133 full
  batches of 64 + one 39-row tail step; the timed window includes the
  per-epoch on-device shuffle gather and ends in a loss readback (sync);
* synthetic data (no egress; same shapes/dtypes — epoch time does not
  depend on pixel values), CoLA vocab 7,000 ~= the real in-domain vocab
  so the embedding scatter cost is honest;
* 1 warmup (compile) + 3 timed epochs per model, best + median reported.
  Wall-clock through the shared tunnel swings with tenant load
  (ROADMAP.md); reference comparisons are to its published table.

Run on the real chip, ONE process at a time:

    python scripts/bench_train.py            # writes TRAINBENCH_r05.json

One JSON line:
  {"metric": "train_epoch_seconds", "value": <lenet s/epoch>, "unit": "s",
   "rows": [{"model", "batch", "steps", "s_per_epoch", "median_s",
             "steps_per_s", "ref_cpu_s", "ref_gpu_s", "vs_ref_gpu_x"}]}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EPOCHS = 3


def run_epochs(jtrain, Xd, yd, n_steps, B, tail=0):
    """One warmup + EPOCHS timed epochs; returns list of epoch seconds.
    Each epoch: on-device shuffle gather, foreach over n_steps full
    batches (+ one tail step), loss readback."""
    import pydynet_tpu as pdn
    n_full = n_steps * B
    times = []
    for e in range(EPOCHS + 1):
        t0 = time.time()
        with pdn.no_grad():
            perm = pdn.Tensor(np.random.permutation(n_full + tail),
                              device=Xd.device)
            Xp, yp = Xd[perm], yd[perm]
            Xb = Xp[:n_full].reshape((n_steps, B) + Xp.shape[1:])
            yb = yp[:n_full].reshape(n_steps, B)
        losses = jtrain.foreach(Xb, yb)
        loss = losses[-1]
        if tail:
            loss = jtrain(Xp[n_full:], yp[n_full:])
        loss.item()  # sync: the epoch really finished
        if e:  # epoch 0 pays the compiles
            times.append(time.time() - t0)
    return times


def bench_mnist(network):
    import pydynet_tpu as pdn
    import pydynet_tpu.nn.functional as F
    from pydynet_tpu.optim import Adam
    from examples.pydynet.mnist import MLP, ConvNet, synthetic_mnist

    np.random.seed(0)
    pdn.manual_seed(0)
    B, n_steps = 256, 313  # 80,128 samples >= the reference's 80,000
    net = {"mlp": MLP(), "conv": ConvNet()}[network].to("cuda:0")
    optimizer = Adam(net.parameters(), lr=1e-4)

    def train_step(bx, by):
        loss = F.cross_entropy_loss(net(bx), by)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return loss

    jtrain = pdn.jit(train_step, state=(net, optimizer))
    (x, y), _ = synthetic_mnist(n_train=B * n_steps, n_test=1)
    with pdn.no_grad():
        Xd = pdn.Tensor(x.astype(np.float32), device=pdn.Device("cuda:0"))
        yd = pdn.Tensor(y, device=pdn.Device("cuda:0"))
    return run_epochs(jtrain, Xd, yd, n_steps, B), n_steps


def bench_cola():
    import pydynet_tpu as pdn
    from pydynet_tpu.optim import Adam
    from examples.pydynet.transformer import (Transformer, construct_mask,
                                              synthetic_cola)

    np.random.seed(0)
    pdn.manual_seed(0)
    B, N, VOCAB = 64, 8551, 7000
    n_steps, tail = N // B, N % B  # 133 full + 39-row tail
    X, y = synthetic_cola(n=N, vocab=VOCAB)
    y = y.astype(np.float32)
    y[y == 0] = -1
    net = Transformer(embed_size=512, num_layers=1, heads=4,
                      forward_expansion=2, dropout=0.0, vocab_size=VOCAB,
                      max_length=X.shape[1]).to("cuda:0")
    optimizer = Adam(net.parameters(), lr=5e-4)

    def train_step(bx, by):
        score = pdn.tanh(net(bx, construct_mask(bx))).reshape(-1)
        loss = pdn.mean(pdn.square(score - by))
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return loss

    jtrain = pdn.jit(train_step, state=(net, optimizer))
    with pdn.no_grad():
        Xd = pdn.Tensor(X, device=pdn.Device("cuda:0"))
        yd = pdn.Tensor(y, device=pdn.Device("cuda:0"))
    return run_epochs(jtrain, Xd, yd, n_steps, B, tail=tail), n_steps + 1


REF = {  # reference README.md:151-153 (CPU NumPy / RTX-4090 CuPy)
    "mlp-3layer-mnist": (7.256, 1.203),
    "lenet-convnet-mnist": (239.664, 2.841),
    "transformer-1L-cola": (17.503, 1.075),
}


def main():
    rows = []
    for name, fn in [("mlp-3layer-mnist", lambda: bench_mnist("mlp")),
                     ("lenet-convnet-mnist", lambda: bench_mnist("conv")),
                     ("transformer-1L-cola", bench_cola)]:
        times, n_steps = fn()
        best, med = min(times), sorted(times)[len(times) // 2]
        ref_cpu, ref_gpu = REF[name]
        row = {"model": name, "batch": 64 if "cola" in name else 256,
               "steps": n_steps, "s_per_epoch": round(best, 3),
               "median_s": round(med, 3),
               "steps_per_s": round(n_steps / best, 1),
               "ref_cpu_s": ref_cpu, "ref_gpu_s": ref_gpu,
               "vs_ref_gpu_x": round(ref_gpu / best, 2)}
        rows.append(row)
        print(f"# {row}", file=sys.stderr, flush=True)

    lenet = next(r for r in rows if r["model"] == "lenet-convnet-mnist")
    out = {"metric": "train_epoch_seconds", "value": lenet["s_per_epoch"],
           "unit": "s", "epochs_timed": EPOCHS, "rows": rows}
    line = json.dumps(out)
    print(line)
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "TRAINBENCH_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
