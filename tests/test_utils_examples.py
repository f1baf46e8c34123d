"""utils (checkpoint/debug/profiler) + example smoke tests (CPU, tiny)."""

import os
import numpy as np
import pytest

import pydynet_tpu as pdn
from pydynet_tpu import nn, optim, utils


def test_checkpoint_roundtrip_with_optimizer(tmp_path):
    net = nn.Sequential(nn.Linear(4, 8), nn.Tanh(), nn.Linear(8, 2))
    opt = optim.Adam(net.parameters(), lr=1e-2)

    def step(x, y):
        opt.zero_grad()
        loss = pdn.nn.functional.mse_loss(net(x), y)
        loss.backward()
        opt.step()
        return loss

    js = pdn.jit(step, state=(net, opt))
    x, y = pdn.Tensor(np.random.randn(8, 4)), pdn.Tensor(np.random.randn(8, 2))
    for _ in range(5):
        js(x, y)

    path = str(tmp_path / "ckpt.npz")
    utils.save_checkpoint(path, net, opt, step=5)

    np.random.seed(99)
    net2 = nn.Sequential(nn.Linear(4, 8), nn.Tanh(), nn.Linear(8, 2))
    opt2 = optim.Adam(net2.parameters(), lr=5e-1)
    step_restored = utils.load_checkpoint(path, net2, opt2)
    assert step_restored == 5
    assert np.isclose(opt2.lr, 1e-2)
    assert np.isclose(opt2.t, opt.t)
    for (n1, p1), (n2, p2) in zip(net._parameters.items(),
                                  net2._parameters.items()):
        assert np.allclose(p1.numpy(), p2.numpy()), n1
    for m1, m2 in zip(opt.m, opt2.m):
        assert np.allclose(m1.numpy(), m2.numpy())

    # identical continued trajectories
    js2 = pdn.jit(step, state=(net, opt))
    l1 = js2(x, y)

    def step2(x, y):
        opt2.zero_grad()
        loss = pdn.nn.functional.mse_loss(net2(x), y)
        loss.backward()
        opt2.step()
        return loss

    l2 = pdn.jit(step2, state=(net2, opt2))(x, y)
    assert np.allclose(l1.numpy(), l2.numpy(), atol=1e-7)


def test_state_dict_strict_missing():
    net = nn.Linear(2, 2)
    with pytest.raises(KeyError):
        utils.load_state_dict(net, {}, strict=True)


def test_checkpoint_extensionless_path_roundtrip(tmp_path):
    """Regression: np.savez appends '.npz' to extensionless paths, which
    broke save -> load through the same path string."""
    net = nn.Linear(3, 2)
    path = str(tmp_path / "ck")  # no extension
    utils.save_checkpoint(path, net)
    np.random.seed(7)
    net2 = nn.Linear(3, 2)
    utils.load_checkpoint(path, net2)
    assert np.allclose(net2.weight.numpy(), net.weight.numpy())


def test_load_state_dict_rejects_wrong_shapes():
    """Regression: the data setter only casts dtype, so without a check a
    wrong-architecture checkpoint silently replaced parameters wholesale."""
    net = nn.Linear(4, 4)
    bad = {name: np.zeros((2, 2)) for name in net._parameters}
    with pytest.raises(ValueError, match="shape mismatch"):
        utils.load_state_dict(net, bad, strict=False)


def test_load_checkpoint_strict_by_default(tmp_path):
    """Resuming from a checkpoint missing parameters must fail loudly, not
    mix restored and fresh-init weights."""
    small = nn.Linear(2, 2)
    path = str(tmp_path / "ck.npz")
    utils.save_checkpoint(path, small)
    bigger = nn.Sequential(nn.Linear(2, 2), nn.Linear(2, 2))
    with pytest.raises(KeyError):
        utils.load_checkpoint(path, bigger)


def test_check_finite():
    net = nn.Linear(2, 2)
    assert utils.check_finite(net) == []
    net.weight.data[0, 0] = np.nan
    with pytest.raises(FloatingPointError):
        utils.check_finite(net)
    assert utils.check_finite(net, raise_on_fail=False) == ["weight"]


def test_step_timer_report():
    t = utils.StepTimer()
    t.step(100)
    rep = t.report("tokens")
    assert "Token" in rep and "tokens/s" in rep


def test_example_autograd1d():
    from examples.pydynet.autograd1d import main
    assert main() < 1e-6


def test_example_autograd2d():
    from examples.pydynet.autograd2d import main
    traj = main(n_iter=40)
    assert np.allclose(traj[-1], [3.0, -1.0], atol=1e-2)


def test_example_ts_prediction_quick():
    from examples.pydynet.ts_prediction import main
    assert main(epochs=8) < 0.7


def test_example_mnist_mlp_quick(capsys):
    from examples.pydynet import mnist
    acc = mnist.main(["--network", "mlp", "--epochs", "2", "--synthetic",
                      "--batch-size", "512", "--lr", "1e-3", "--no-cuda"])
    assert acc > 0.5


@pytest.mark.slow
def test_example_transformer_quick():
    from examples.pydynet.transformer import main
    acc = main(["--epochs", "2", "--batch-size", "256"])
    assert 0.0 <= acc <= 1.0


def test_dataloader_prefetch_matches_sequential():
    from pydynet_tpu.data import data_loader

    X = np.arange(100).reshape(50, 2)
    y = np.arange(50)
    a = [by.tolist() for _, by in
         data_loader(X, y, batch_size=8)]
    loader = data_loader(X, y, batch_size=8)
    loader.prefetch = 4
    b = [by.tolist() for _, by in loader]
    assert a == b


def test_prefetch_shuffle_seed_parity_despite_main_thread_draws():
    """The epoch permutation must be drawn on the CALLING thread at
    iterator creation (regression: the worker pulled it from the global
    np.random stream, racing any main-thread draws)."""
    from pydynet_tpu.data import data_loader

    X = np.arange(200).reshape(100, 2)
    y = np.arange(100)

    np.random.seed(33)
    want = [by.tolist() for _, by in data_loader(X, y, 8, shuffle=True)]

    np.random.seed(33)
    loader = data_loader(X, y, 8, shuffle=True)
    loader.prefetch = 2
    it = iter(loader)
    np.random.randn(1000)  # main-thread draw racing the worker
    got = [by.tolist() for by in (b[1] for b in it)]
    assert want == got


def test_prefetch_iter_unblocks_on_early_exit():
    """Regression: breaking out of a prefetching DataLoader left the
    worker thread blocked on a full queue forever."""
    from pydynet_tpu.data import DataLoader, Dataset

    class DS(Dataset):
        def __init__(self):
            self.x = np.arange(64)

        def __len__(self):
            return 64

        def __getitem__(self, idx):
            return self.x[idx]

    it = iter(DataLoader(DS(), batch_size=2, prefetch=2))
    next(it)  # worker is now parked on a full queue
    thread = it._thread
    it.close()
    thread.join(timeout=5.0)
    assert not thread.is_alive()


def test_prefetch_next_after_close_terminates():
    """Regression (round-2 advisor): after close() the worker's stop-aware
    put could drop the end-of-stream sentinel, so a subsequent __next__()
    blocked forever on the queue.  Now a stopped/dead worker with a drained
    queue ends iteration."""
    from pydynet_tpu.data import DataLoader, Dataset

    class DS(Dataset):
        def __len__(self):
            return 64

        def __getitem__(self, idx):
            return np.asarray(idx)

    it = iter(DataLoader(DS(), batch_size=2, prefetch=1))
    next(it)
    it.close()
    it._thread.join(timeout=5.0)
    # drain whatever landed before the stop, then expect a prompt end
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        for _ in range(8):  # queue depth 1 (+ sentinel race): few items max
            next(it)


def test_checkpoint_restore_keeps_scalars_uncommitted(tmp_path):
    """Regression: restoring opt.t through the data setter re-COMMITTED the
    scalar to CPU, resurrecting the eager-TPU 'incompatible devices'
    crash."""
    net = nn.Linear(3, 3)
    opt = optim.Adam(net.parameters(), lr=1e-3)
    path = str(tmp_path / "ck.npz")
    utils.save_checkpoint(path, net, opt, step=1)
    net2 = nn.Linear(3, 3)
    opt2 = optim.Adam(net2.parameters(), lr=1e-3)
    utils.load_checkpoint(path, net2, opt2)
    assert not opt2._t_tensor._data.committed
    assert not opt2._lr_tensor._data.committed


def test_optimizer_scalar_state_uncommitted():
    """Regression: CPU-committed lr/t scalars crash eager steps on
    TPU-resident params ('incompatible devices'); they must stay
    uncommitted so jax co-locates them with whatever device the math
    runs on."""
    net = nn.Linear(3, 3)
    for opt in (optim.SGD(net.parameters(), lr=0.1),
                optim.Adam(net.parameters(), lr=0.1)):
        assert not opt._lr_tensor._data.committed
        if hasattr(opt, "_t_tensor"):
            assert not opt._t_tensor._data.committed


def test_checkpoint_restore_clears_decode_weight_cache(tmp_path):
    """Regression: generate() snapshots stacked device weights; restoring a
    checkpoint must invalidate that snapshot or decode keeps serving the
    pre-restore weights."""
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                  max_seq_len=32, max_batch_size=1, n_layers=2,
                  dtype=np.float32)
    model.eval()
    ids = np.array([[1, 5, 9]])
    with pdn.no_grad():
        before = [int(t.numpy()[0, 0]) for t in model.generate(ids, 10)]
    assert model._weights_cache  # populated by generate
    path = str(tmp_path / "llama_ck.npz")
    utils.save_checkpoint(path, model)

    np.random.seed(1)  # different weights
    model2 = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                   max_seq_len=32, max_batch_size=1, n_layers=2,
                   dtype=np.float32)
    model2.eval()
    with pdn.no_grad():
        [t for t in model2.generate(ids, 10)]  # populate the cache
    utils.load_checkpoint(path, model2)
    assert not model2._weights_cache  # invalidated by the restore
    with pdn.no_grad():
        after = [int(t.numpy()[0, 0]) for t in model2.generate(ids, 10)]
    assert after == before


def test_checkpoint_moment_shape_mismatch_raises(tmp_path):
    """Regression: index-matched optimizer moments loaded into a different
    trainable set silently paired old moments with new params."""
    net = nn.Linear(4, 4)
    opt = optim.Adam(net.parameters(), lr=1e-3)
    path = str(tmp_path / "ck.npz")
    utils.save_checkpoint(path, net, opt)

    net2 = nn.Linear(4, 4)
    opt2 = optim.Adam([list(net2.parameters())[1]], lr=1e-3)  # bias only
    with pytest.raises((ValueError, KeyError)):
        utils.load_checkpoint(path, net2, opt2)


def test_checkpoint_skips_non_persistent_scratch(tmp_path):
    """KV caches / RoPE tables (persistent=False) stay out of checkpoints,
    so a train-config blob restores into a different serving config."""
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                  max_seq_len=32, max_batch_size=4, n_layers=2,
                  dtype=np.float32)
    sd = utils.state_dict(model)
    assert not any("cache_k" in k or "cache_v" in k or "freqs_" in k
                   for k in sd), sorted(sd)[:4]
    path = str(tmp_path / "ck.npz")
    utils.save_checkpoint(path, model)

    # restore into a model built with a DIFFERENT max_batch_size/seq_len
    np.random.seed(1)
    model2 = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                   max_seq_len=16, max_batch_size=1, n_layers=2,
                   dtype=np.float32)
    utils.load_checkpoint(path, model2)  # strict=True must pass
    np.testing.assert_array_equal(
        model2._parameters["tok_embedding.weight"].numpy(),
        model._parameters["tok_embedding.weight"].numpy())


def test_load_state_dict_rejects_unexpected_keys():
    net = nn.Linear(2, 2)
    state = utils.state_dict(net)
    state["phantom.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError, match="unexpected"):
        utils.load_state_dict(net, state, strict=True)
    utils.load_state_dict(net, state, strict=False)  # intersection loads


def test_checkpoint_extra_round_trip(tmp_path):
    net = nn.Linear(2, 2)
    path = str(tmp_path / "ck.npz")
    utils.save_checkpoint(path, net, step=7,
                          extra={"epoch": 3, "best_loss": 0.5})
    net2 = nn.Linear(2, 2)
    step, extra = utils.load_checkpoint(path, net2, with_extra=True)
    assert step == 7
    assert extra["epoch"] == 3 and abs(extra["best_loss"] - 0.5) < 1e-9
    assert utils.read_extra(path)["epoch"] == 3


def test_checkpoint_extensionless_path_round_trip(tmp_path):
    """save_checkpoint writes EXACTLY the given path (no np.savez '.npz'
    suffix surprise) and the llama/clip finetuned-io paths round-trip
    extensionless too."""
    from pydynet_tpu.models.llama import io as lio
    from pydynet_tpu.models.llama.model import Llama

    np.random.seed(0)
    model = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                  max_seq_len=16, max_batch_size=1, n_layers=1,
                  dtype=np.float32)
    p = str(tmp_path / "ft_blob")  # extensionless on purpose
    lio.save_finetuned_parameters(model, p)
    assert os.path.exists(p) and not os.path.exists(p + ".npz")
    np.random.seed(1)
    model2 = Llama(vocab_size=97, embed_dim=24, n_heads=2, ffn_dim=40,
                   max_seq_len=16, max_batch_size=1, n_layers=1,
                   dtype=np.float32)
    lio.load_finetuned_parameters(model2, p)
    np.testing.assert_array_equal(
        model2._parameters["lm_head.weight"].numpy(),
        model._parameters["lm_head.weight"].numpy())
