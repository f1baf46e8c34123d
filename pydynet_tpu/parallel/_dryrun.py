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
    """The actual mesh work; assumes ``jax.devices()`` has >= n CPU devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import llama_spmd
    from .mesh import make_mesh, shard

    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} "
            f"({devices[0].platform})")

    tp = 2 if n_devices % 2 == 0 else 1
    dp = n_devices // tp
    mesh = make_mesh({"dp": dp, "tp": tp}, devices=devices[:n_devices])

    cfg = llama_spmd.config(vocab_size=128, dim=32, n_heads=2, ffn_dim=64,
                            n_layers=2, max_seq_len=16)
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

    print(f"dryrun_multichip({n_devices}): mesh dp={dp} tp={tp}, "
          f"loss={loss:.4f}, decode {toks.shape} OK")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
