"""Multi-chip MSM: points sharded over the mesh 'data' axis, per-device
Pippenger bucket accumulation, cross-chip combination of per-window sums.

This is the TPU answer to multiexp.go's goroutine fan-out (SURVEY.md §2.8 P3):
the big data-parallel work (digit extraction, bucket scatter, tree reduce)
never leaves the local chip; only n_windows Jacobian points per device cross
the ICI (an all_gather of a few KB), after which every chip folds the same
tiny reduction redundantly."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves.point import Affine, Jac, jac_add, jac_double
from ..curves.spec import CurveSpec
from ..msm.msm import DEFAULT_CHUNK, _horner_windows, _ops_for_curve, window_sums


def _fold_axis0(cs: CurveSpec, pts: Jac) -> Jac:
    """Pairwise tree fold of a (n_limbs, m, ...) Jac stack along axis 1."""
    m = pts.x.shape[1]
    while m > 1:
        h = m // 2
        lhs = Jac(pts.x[:, :h], pts.y[:, :h], pts.z[:, :h])
        rhs = Jac(pts.x[:, h : 2 * h], pts.y[:, h : 2 * h], pts.z[:, h : 2 * h])
        merged = jac_add(cs, lhs, rhs)
        if m % 2:
            tail = Jac(pts.x[:, -1:], pts.y[:, -1:], pts.z[:, -1:])
            merged = Jac(
                jnp.concatenate([merged.x, tail.x], 1),
                jnp.concatenate([merged.y, tail.y], 1),
                jnp.concatenate([merged.z, tail.z], 1),
            )
            m = h + 1
        else:
            m = h
        pts = merged
    return Jac(pts.x[:, 0], pts.y[:, 0], pts.z[:, 0])


def msm_sharded(
    cs: CurveSpec,
    mesh: Mesh,
    points: Affine,
    scalars: jax.Array,
    c: int = 12,
    chunk: int = DEFAULT_CHUNK,
    axis: str = "data",
) -> Jac:
    """MSM with the point/scalar batch sharded along `axis` of `mesh`.

    Returns a replicated Jac result (batch shape ()).  Per-device bucket
    accumulation is the exact segmented-scan path (msm.msm), so any scalar
    distribution is handled without cross-chip coordination."""
    n = points.x.shape[1]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0

    def local_fn(px, py, s):
        pts = Affine(px, py)
        ws = window_sums(cs, pts, s, c, chunk)  # (n_limbs, n_windows)
        # gather all devices' window sums; fold locally (identical everywhere)
        gx = jax.lax.all_gather(ws.x, axis, axis=1)  # (n_limbs, n_dev, n_windows)
        gy = jax.lax.all_gather(ws.y, axis, axis=1)
        gz = jax.lax.all_gather(ws.z, axis, axis=1)
        folded = _fold_axis0(cs, Jac(gx, gy, gz))  # (n_limbs, n_windows)
        acc = _horner_windows(_ops_for_curve(cs), folded, c)
        return acc.x, acc.y, acc.z

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    fn = jax.jit(sharded)
    x, y, z = fn(points.x, points.y, scalars)
    return Jac(x, y, z)


def msm_sharded_2d(
    cs: CurveSpec,
    mesh: Mesh,
    points: Affine,
    scalars: jax.Array,
    c: int = 12,
    chunk: int = DEFAULT_CHUNK,
    window_axis: str = "window",
    data_axis: str = "data",
) -> Jac:
    """MSM on a 2-D (window x data) mesh (SURVEY.md §2.8 P3 layout study).

    Points/scalars are sharded along `data_axis` and replicated along
    `window_axis`; each device processes only its 1/Dw slice of the signed
    windows over its 1/Dd point shard, so per-device bucket memory and
    window-loop latency shrink by Dw.  Combination: all_gather + fold over
    the data axis (per local window), then all_gather over the window axis
    to assemble the full window vector for the replicated Horner fold.

    See parallel/MSM_LAYOUT.md for when this beats the 1-D layout."""
    from ..msm.msm import signed_digits

    n = points.x.shape[1]
    ops = _ops_for_curve(cs)
    n_dev = mesh.shape[data_axis]
    d_w = mesh.shape[window_axis]
    assert n % n_dev == 0
    n_windows = -(-(cs.fr.bits + 1) // c)
    w_local = -(-n_windows // d_w)
    w_pad = w_local * d_w
    nb = 1 << (c - 1)

    def local_fn(px, py, s):
        pts = Affine(px, py)
        digits = signed_digits(cs.fr.bits, c, s)         # (W, n_loc)
        digits = jnp.pad(digits, ((0, w_pad - n_windows), (0, 0)))
        wi = jax.lax.axis_index(window_axis)
        d_loc = jax.lax.dynamic_slice_in_dim(
            digits, wi * w_local, w_local, axis=0)        # (w_local, n_loc)
        from ..msm.msm import _all_window_buckets, _weighted_bucket_sums

        buckets = _all_window_buckets(ops, pts, d_loc, nb, chunk)
        ws = _weighted_bucket_sums(ops, buckets)          # (L, w_local)
        # fold point shards: all_gather over data, tree-fold locally
        g = [jax.lax.all_gather(a, data_axis, axis=1) for a in ws]
        folded = _fold_axis0(cs, Jac(*g))                 # (L, w_local)
        # assemble every window: all_gather over the window axis
        g2 = [jax.lax.all_gather(a, window_axis, axis=1) for a in folded]
        full = Jac(*(a.reshape(a.shape[0], w_pad) for a in g2))
        sliced = Jac(*(a[:, :n_windows] for a in full))
        acc = _horner_windows(ops, sliced, c)
        return acc.x, acc.y, acc.z

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, data_axis), P(None, data_axis), P(None, data_axis)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    x, y, z = jax.jit(sharded)(points.x, points.y, scalars)
    return Jac(x, y, z)
