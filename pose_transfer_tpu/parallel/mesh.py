"""Data-parallel scaling over a device mesh.

The reference trains on a single GPU with no distributed support of any kind
(SURVEY.md §2.9). The TPU-native scale-out (BASELINE.json config 5) is a
1-D ``jax.sharding.Mesh`` over the ICI slice:

- parameters + optimizer state replicated (``PartitionSpec()``),
- every batch sharded on its batch axis (``PartitionSpec('data')``),
- the train step jitted with those shardings — XLA's SPMD partitioner
  inserts the gradient ``all-reduce`` over ICI automatically; no explicit
  collectives needed at this model scale (82 M params, conv GAN).

The same code path runs on real multi-chip TPU and on the virtual CPU mesh
(``--xla_force_host_platform_device_count``) used by tests and the driver's
``dryrun_multichip``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.engine import GANConfig, make_train_step


def make_mesh(num_devices: int | None = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` visible devices."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))


def config_for_mesh(config: GANConfig, mesh: Mesh | None) -> GANConfig:
    """Return ``config`` with ``device_count`` set to the mesh width.

    Call this BEFORE ``build_models``/``create_state``: the auto
    ``warp_windowed`` rule keys off the PER-DEVICE batch, and the windowed
    fold must stay off under a mesh (its placement chains/kernels index the
    sharded batch axis — GANConfig.warp_windowed docs). ``mesh=None``
    (single device) returns the config unchanged with device_count 1.
    """
    import dataclasses
    n = 1 if mesh is None else int(mesh.devices.size)
    return dataclasses.replace(config, device_count=n)


def _check_mesh_config(config: GANConfig, mesh: Mesh, what: str):
    if config.device_count != int(mesh.devices.size):
        raise ValueError(
            f"{what}: config.device_count={config.device_count} but the "
            f"mesh has {int(mesh.devices.size)} device(s). Build the "
            f"models from config_for_mesh(config, mesh) — the auto "
            f"warp_windowed rule must see the data-parallel width")


def replicate_state(state, mesh: Mesh):
    """Place the full state replicated on every mesh device."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def unreplicate_state(state):
    """Fetch a host copy (replicated arrays read from one shard)."""
    return jax.device_get(state)


def batch_shardings(mesh: Mesh, axis_name: str = "data"):
    """(disc_batches, gen_batch) shardings: disc draws have a leading
    ``training_ratio`` axis, so the batch axis is axis 1."""
    disc = NamedSharding(mesh, P(None, axis_name))
    gen = NamedSharding(mesh, P(axis_name))
    return disc, gen


def make_parallel_train_step(config: GANConfig, gen, disc, mesh: Mesh,
                             axis_name: str = "data"):
    """Jit the fused GAN step with replicated params + batch-sharded data.

    Per-device batch is ``batch_size // mesh size``; the loss scaling uses
    the global ``config.batch_size``, matching single-device numerics
    exactly (verified in tests/test_parallel.py).
    """
    _check_mesh_config(config, mesh, "make_parallel_train_step")
    step = make_train_step(config, gen, disc)

    def stepped(state, disc_fake, disc_real, gen_batch):
        # trace inside the fold-mesh context: a windowed warp fold runs
        # per-device on its local batch via shard_map (ops.warp.fold_mesh)
        from ..ops import warp as warp_ops
        with warp_ops.fold_mesh(mesh, axis_name):
            return step(state, disc_fake, disc_real, gen_batch)

    repl = NamedSharding(mesh, P())
    disc_shard, gen_shard = batch_shardings(mesh, axis_name)
    # out images: (N, H, W, 3) baseline / (S, N, H, W, 3) stacked stages —
    # the batch axis moves to axis 1 for stacked
    out_shard = NamedSharding(mesh, P(None, axis_name)) \
        if config.gen_type == "stacked" else gen_shard
    return jax.jit(
        stepped,
        in_shardings=(repl, disc_shard, disc_shard, gen_shard),
        out_shardings=(repl, repl, out_shard),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(config: GANConfig, gen, mesh: Mesh,
                            axis_name: str = "data"):
    """Batch-sharded inference forward."""
    from ..train.engine import make_eval_step

    _check_mesh_config(config, mesh, "make_parallel_eval_step")
    inner = make_eval_step(config, gen)

    def stepped(params, batch):
        from ..ops import warp as warp_ops
        with warp_ops.fold_mesh(mesh, axis_name):
            return inner(params, batch)

    repl = NamedSharding(mesh, P())
    gen_shard = NamedSharding(mesh, P(axis_name))
    out_shard = NamedSharding(mesh, P(None, axis_name)) \
        if config.gen_type == "stacked" else gen_shard
    return jax.jit(stepped, in_shardings=(repl, gen_shard),
                   out_shardings=(out_shard, gen_shard))
