"""Multi-chip four-step (Bailey) NTT over a device mesh — the classic
"transpose" NTT the reference never needed (its FFT fan-out is goroutines,
fr/fft/fft.go:195; SURVEY.md §2.8 P4 maps it to all_to_all over ICI).

Decomposition: view the length-N vector as an (R, C) row-major matrix.
  step 1: length-R NTTs down the columns          (local: shard the C axis)
  step 2: twiddle by w_N^(k*c)                    (local)
  step 3: all_to_all transpose -> shard the R axis
  step 4: length-C NTTs along the rows            (local)
Output element X[k + R*j] = A2[k, j]: natural order is recovered by a final
(C, R) transpose, which we fold into the same all_to_all'd layout helper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import mont
from ..fields.spec import FieldSpec
from ..fft.domain import Domain, powers
from ..fft.fft import ntt as ntt_single


def _local_ntt_batched(domain: Domain, a: jax.Array) -> jax.Array:
    """NTT along the last axis of (n_limbs, B, n), vmapped over B."""
    return jax.vmap(lambda x: ntt_single(domain, x), in_axes=1, out_axes=1)(a)


def ntt_sharded(
    spec: FieldSpec,
    mesh: Mesh,
    a: jax.Array,
    log2_rows: int,
    axis: str = "data",
) -> jax.Array:
    """Natural-order in / natural-order out NTT of a (n_limbs, N) array whose
    last axis is sharded over `axis`.  R = 2^log2_rows is the column-NTT
    length; C = N / R.  Requires n_dev | C and n_dev | R."""
    n = a.shape[1]
    R = 1 << log2_rows
    C = n // R
    assert R * C == n
    n_dev = mesh.shape[axis]
    assert C % n_dev == 0 and R % n_dev == 0

    dom_R = Domain(spec, R, with_coset_tables=False)
    dom_C = Domain(spec, C, with_coset_tables=False)
    dom_N = Domain(spec, n, with_coset_tables=False)
    # w_N powers for the twiddle step: w_N^(k*c) = wN_pows[(k*c) mod N]
    wN_pows = powers(spec, dom_N.generator, n)  # (n_limbs, N)

    nl = spec.n_limbs

    def local_fn(x, wN):
        # x: (nl, R, C/n_dev) — this device's columns (global col offset me*Cl)
        me = jax.lax.axis_index(axis)
        Cl = C // n_dev
        # step 1: column NTTs (length R): move R to last axis
        xc = jnp.swapaxes(x, 1, 2)               # (nl, Cl, R)
        xc = _local_ntt_batched(dom_R, xc)       # NTT along R
        # step 2: twiddle w_N^(k * c_global), k in [0,R), c_global = me*Cl + j
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (Cl, R), 1)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (Cl, R), 0) + me * Cl
        tw_idx = (k_idx * c_idx) % n
        tw = jnp.take(wN, tw_idx.reshape(-1), axis=1).reshape(nl, Cl, R)
        xc = mont.mul(spec, xc, tw)
        # step 3: transpose via all_to_all: xc[l, j, k] = A1'[k, c=me*Cl+j];
        # after: this device holds rows k in [me*R/n_dev, (me+1)*R/n_dev)
        # with all C columns in global order.
        xr = jnp.swapaxes(xc, 1, 2)              # (nl, R, Cl)
        xr = jax.lax.all_to_all(xr, axis, split_axis=1, concat_axis=2, tiled=True)
        # xr: (nl, R/n_dev, C), [l, kloc, c] = A1'[me*R/n_dev + kloc, c]
        # step 4: row NTTs (length C)
        xr = _local_ntt_batched(dom_C, xr)       # (nl, R/n_dev, C)
        # output: X[k + R*j] = A2[k, j]; this device holds k in
        # [me*R/n_dev, (me+1)*R/n_dev).  Return in (k_local, j) layout.
        return xr

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    x3 = a.reshape(nl, R, C)  # (nl, R, C), C axis sharded by in_specs
    out = jax.jit(fn)(x3, wN_pows)  # (nl, R, C) sharded on axis 1 (k)
    # natural order: X[k + R*j] = out[:, k, j] -> transpose to (C, R) then flat
    out = jnp.swapaxes(out, 1, 2).reshape(nl, n)
    return out
