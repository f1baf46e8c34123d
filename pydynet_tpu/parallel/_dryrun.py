"""Multi-chip dry run on a virtual CPU device mesh.

``main(n)`` forces the CPU platform *in-process* (the sandbox's TPU plugin
overrides the ``JAX_PLATFORMS`` env var from sitecustomize, so only a
``jax.config.update`` call wins) and then jits the full SPMD train step —
real dp x tp shardings, GSPMD collectives — plus a tp-sharded greedy decode
over an ``n``-device mesh, one step each on tiny shapes.

Run via ``python -c "from pydynet_tpu.parallel._dryrun import main; main(8)"``
in a FRESH process: once another jax backend has been initialised the
platform can no longer be switched, which is exactly why
``__graft_entry__.dryrun_multichip`` shells out to this module instead of
running it inline.
"""
from __future__ import annotations


def main(n_devices: int) -> None:
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    # must run before first backend use; env vars alone are overridden by
    # the TPU plugin's sitecustomize
    jax.config.update("jax_platforms", "cpu")
    run(n_devices)


def run(n_devices: int) -> None:
    """The actual mesh work; assumes ``jax.devices()`` has >= n CPU devices.

    Exercises every parallelism axis the framework ships: a dp x tp SPMD
    train step + tp-sharded decode (GSPMD), a dp x pp GPipe train step
    (shard_map + ppermute), sp ring attention, and an ep-sharded MoE
    forward/grad — one small step each.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import llama_spmd, moe, pipeline
    from .mesh import make_mesh, shard
    from .ring_attention import ring_attention

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"({devices[0].platform})")
    devices = devices[:n_devices]

    # ---- dp x tp: GSPMD train step + tp-sharded decode ---- #
    tp = 2 if n_devices % 2 == 0 else 1
    dp = n_devices // tp
    mesh = make_mesh({"dp": dp, "tp": tp}, devices=devices)

    cfg = llama_spmd.config(vocab_size=128, dim=32, n_heads=2, ffn_dim=64,
                            n_layers=2, max_seq_len=16,
                            n_kv_heads=1)  # GQA exercised in SPMD too
    rng = np.random.RandomState(0)
    params = llama_spmd.init_params(rng, cfg)
    params = llama_spmd.shard_params(params, mesh)

    B, L = 2 * dp, 8
    tokens = jnp.asarray(rng.randint(0, cfg["vocab_size"], (B, L)), jnp.int32)
    targets = jnp.asarray(rng.randint(0, cfg["vocab_size"], (B, L)),
                          jnp.int32)
    tokens = shard(tokens, mesh, "dp", None)
    targets = shard(targets, mesh, "dp", None)

    step = llama_spmd.make_train_step(mesh, cfg, lr=1e-2)
    params, loss = step(params, tokens, targets)
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # tp/dp-sharded greedy decode (KV caches head-sharded over tp)
    toks = llama_spmd.generate(params, tokens[:, :4], 4, mesh, cfg)
    assert toks.shape == (B, 4), toks.shape

    # ---- dp x tp continuous-batching SERVING (serve_spmd) ---- #
    from .serve_spmd import SpmdLlamaServer

    srv = SpmdLlamaServer(params, mesh, cfg=cfg, batch_size=dp, chunk=4,
                          eos_id=-1)
    srids = [srv.submit([1, 2, 3], max_new_tokens=4),
             srv.submit([4, 5], max_new_tokens=4)]
    sdone = srv.run()
    assert set(sdone) == set(srids) and \
        all(len(sdone[r].tokens) == 4 for r in srids)

    # quant x kv-int8 x tp x prefix-cache serving on the mesh — the full
    # 7B serving composition (weight-only int8 pytree, plain-XLA scaled
    # int matmuls — llama_spmd.quantize_params; tuple (data, scale) KV
    # caches; the second request reuses the first's prompt-prefix rows)
    qsrv = SpmdLlamaServer(params, mesh, cfg=cfg, batch_size=dp, chunk=4,
                           eos_id=-1, quant="int8", kv_quant="int8",
                           prefix_cache=True)
    pa = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    qa = qsrv.submit(pa, max_new_tokens=6)  # outlives chunk 1: stays a
    qsrv.step()                             # live donor (no idle rewind)
    qb = qsrv.submit(pa[:9] + [11], max_new_tokens=3)
    qdone = qsrv.run()
    assert set(qdone) == {qa, qb} and qsrv.prefix_hits == 1, \
        (sorted(qdone), qsrv.prefix_hits)

    # -- dp x pp x tp: GPipe ring with Megatron tp INSIDE the shard_map -- #
    pp = 2 if n_devices % 2 == 0 else 1
    ptp = 2 if n_devices % 4 == 0 else 1
    pdp = n_devices // (pp * ptp)
    pp_mesh = make_mesh({"dp": pdp, "pp": pp, "tp": ptp}, devices=devices)
    pp_cfg = llama_spmd.config(vocab_size=128, dim=32, n_heads=2, ffn_dim=64,
                               n_layers=2 * pp, max_seq_len=16,
                               n_kv_heads=1)  # GQA inside the tp ring too
    pp_params = pipeline.prepare_pp_params(
        llama_spmd.init_params(rng, pp_cfg), pp_mesh, pp, cfg=pp_cfg)
    pp_step = pipeline.make_pp_train_step(pp_mesh, pp_cfg, lr=1e-2,
                                          microbatches=2)
    ptokens = jnp.asarray(rng.randint(0, 128, (2 * pdp, 8)), jnp.int32)
    ptargets = jnp.asarray(rng.randint(0, 128, (2 * pdp, 8)), jnp.int32)
    pp_params, pp_loss = pp_step(pp_params, ptokens, ptargets)
    pp_loss = float(pp_loss)
    assert np.isfinite(pp_loss), f"non-finite pp loss {pp_loss}"

    # ---- sp: exact ring attention over a sequence-sharded mesh ---- #
    sp_mesh = make_mesh({"sp": n_devices}, devices=devices)
    Lsp = 8 * n_devices
    q = jnp.asarray(rng.standard_normal((1, Lsp, 2, 8)), jnp.float32)
    att = ring_attention(shard(q, sp_mesh, None, "sp"),
                         shard(q, sp_mesh, None, "sp"),
                         shard(q, sp_mesh, None, "sp"), sp_mesh, causal=True)
    assert np.isfinite(np.asarray(att)).all()

    # ---- foreach x mesh: dp-sharded whole-epoch fusion ---- #
    import pydynet_tpu as pdn
    from pydynet_tpu import nn, optim

    np.random.seed(0)
    net = nn.Sequential(nn.Linear(6, 8), nn.Tanh(), nn.Linear(8, 3))
    opt = optim.SGD(net.parameters(), lr=0.1, momentum=0.0, nesterov=False)

    def train_step(x, y):
        opt.zero_grad()
        l = pdn.nn.functional.mse_loss(net(x), y)
        l.backward()
        opt.step()
        return l

    dp_mesh = make_mesh({"dp": n_devices}, devices=devices)
    js = pdn.jit(train_step, state=(net, opt), mesh=dp_mesh)
    Xb = pdn.Tensor(rng.standard_normal((3, 2 * n_devices, 6)))
    Yb = pdn.Tensor(rng.standard_normal((3, 2 * n_devices, 3)))
    fe_losses = js.foreach(Xb, Yb).numpy().reshape(-1)
    assert np.isfinite(fe_losses).all(), fe_losses

    # ---- ep: expert-parallel switch MoE forward + grad ---- #
    ep_mesh = make_mesh({"ep": n_devices}, devices=devices)
    mparams = moe.shard_moe_params(
        moe.init_moe_params(rng, n_devices, 16, 32), ep_mesh)
    x = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)

    def moe_loss(p, x):
        out, aux = moe.moe_ffn(p, x)
        return jnp.sum(out ** 2) + 0.01 * aux

    mloss, mgrads = jax.jit(jax.value_and_grad(moe_loss))(mparams, x)
    assert np.isfinite(float(mloss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(mgrads))

    print(f"dryrun_multichip({n_devices}): dp={dp} tp={tp} loss={loss:.4f} "
          f"decode {toks.shape} serve {len(sdone)} reqs; "
          f"dp={pdp}xpp={pp}xtp={ptp} "
          f"loss={pp_loss:.4f}; "
          f"sp={n_devices} ring-attention; "
          f"foreach x dp={n_devices} epoch loss={fe_losses[-1]:.4f}; "
          f"ep={n_devices} moe "
          f"loss={float(mloss):.4f} OK")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
