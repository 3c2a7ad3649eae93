"""Multi-chip scaling over a TPU mesh.

The reference is single-process single-GPU (SURVEY.md section 2: no comm
library at all); its scaling axis is "bit coalescing" into one device's batch.
The TPU-native generalization is *bit coalescing across chips*: independent
ciphertext bits/gates are data-parallel, so we shard the gate batch over a
`jax.sharding.Mesh` with `shard_map` (keys replicated; ICI never sees a
ciphertext unless a collective op like Cannon's matmul needs it).

Axes:
  dp  - gate/ciphertext batch (the bit-coalescing axis)
  ks  - optional key-switch table sharding (rows of the KS matmul), reduced
        with psum; demonstrates intra-kernel tensor parallelism.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.lwe import LweCiphertext
from ..core import bootstrap as bs
from .. import gates


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis_name,))


def _replicated_cloud_spec(cloud):
    return jax.tree.map(lambda _: P(), cloud)


def _batch_ct_spec(axis="dp"):
    return LweCiphertext(a=P(axis, None), b=P(axis), cv=P(axis))


def sharded_gate2(name: str, x: LweCiphertext, y: LweCiphertext, cloud,
                  mesh: Mesh, axis: str = "dp") -> LweCiphertext:
    """A 2-input bootstrapped gate with the batch sharded across the mesh.

    Requires batch size divisible by mesh size. Keys are replicated; each chip
    bootstraps its local shard (zero ICI traffic - the DP analog of bit
    coalescing, SURVEY.md section 2 item 3).
    """
    const, ca, cb = gates.GATE_TABLE[name]

    def local(xs, ys, ck):
        t = gates._affine2(xs, ys, jnp.int32(const), jnp.int32(ca), jnp.int32(cb))
        return bs.bootstrap(t, jnp.int32(gates.MU), ck)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_batch_ct_spec(axis), _batch_ct_spec(axis), _replicated_cloud_spec(cloud)),
        out_specs=_batch_ct_spec(axis),
        check_rep=False,
    )
    return jax.jit(fn)(x, y, cloud)


def sharded_bootstrap_step(x: LweCiphertext, cloud, mesh: Mesh, axis: str = "dp"):
    """Full batched bootstrap sharded over the mesh (used by dryrun/benchmarks)."""
    def local(xs, ck):
        return bs.bootstrap(xs, jnp.int32(gates.MU), ck)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_batch_ct_spec(axis), _replicated_cloud_spec(cloud)),
        out_specs=_batch_ct_spec(axis),
        check_rep=False,
    )
    return jax.jit(fn)(x, cloud)
