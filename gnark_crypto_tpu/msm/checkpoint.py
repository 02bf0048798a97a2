"""Checkpointed MSM: resumable multi-scalar multiplication for long jobs.

SURVEY.md §5 notes the reference expresses checkpoint/resume only as object
serialization (kzg/marshal.go WriteDump/ReadDump, mpcsetup state) — there is
no mid-job checkpoint of a long-running MSM, because on a CPU the job is
minutes.  On a shared TPU a 2^26+ MSM (or an SRS build / ceremony
verification sweep) is long enough that preemption matters, so mid-job
checkpointing is net-new design work this library owns.

Design: MSM is a sum — split the point stream into fixed chunks, run each
chunk through the normal (fast) path, and fold the running Jacobian total.
The checkpoint state after chunk k is (k, running total), a few hundred
bytes, written atomically (tmp + rename) so a kill at any instant leaves
either the old or the new state.  Resume skips the first k chunks and keeps
folding.  The result is bit-identical to a single-shot MSM because Jacobian
addition is associative and the chunk boundaries are deterministic.

State file layout (little-endian):
  magic b"GCTMSM1\\0" | u32 chunk_log2 | u64 n_points | u64 next_chunk |
  u32 n_limbs | X limbs | Y limbs | Z limbs  (u32 little-endian each)
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..curves import point
from ..curves.point import Jac
from ..curves.spec import CurveSpec
from ..fields import mont

_MAGIC = b"GCTMSM1\x00"


def _jac_to_host(cs: CurveSpec, p: Jac) -> tuple:
    return tuple(np.asarray(v).reshape(cs.fp.n_limbs) for v in p)


def _save_state(path: str, chunk_log2: int, n: int, next_chunk: int,
                total_host: tuple) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<IQQI", chunk_log2, n, next_chunk,
                            len(total_host[0])))
        for limbs in total_host:
            f.write(np.asarray(limbs, dtype="<u4").tobytes())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _load_state(path: str):
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path}: not an MSM checkpoint file")
        chunk_log2, n, next_chunk, n_limbs = struct.unpack(
            "<IQQI", f.read(24))
        coords = []
        for _ in range(3):
            buf = f.read(4 * n_limbs)
            if len(buf) != 4 * n_limbs:
                raise ValueError(f"{path}: truncated checkpoint")
            coords.append(np.frombuffer(buf, dtype="<u4").copy())
    return chunk_log2, n, next_chunk, coords


def msm_checkpointed(cs: CurveSpec, points: point.Affine, scalars,
                     state_path: str, c: int | None = None,
                     chunk_log2: int = 20, use_fast: bool = True) -> Jac:
    """MSM with on-disk resume state; bit-identical to the one-shot path.

    If `state_path` exists, the job resumes after its last completed chunk
    (the file must match this job's size/chunking — a mismatch raises).
    The file is removed on completion.  On CPU/toy sizes set
    use_fast=False to run chunks through the exact segmented-scan path.
    """
    import jax.numpy as jnp

    from .msm import msm
    from .pallas_msm import msm_fast

    n = points.x.shape[1]
    assert scalars.shape[1] == n
    chunk = 1 << chunk_log2
    n_chunks = max(1, -(-n // chunk))

    start = 0
    total = None
    if os.path.exists(state_path):
        saved_log2, saved_n, next_chunk, coords = _load_state(state_path)
        if saved_log2 != chunk_log2 or saved_n != n:
            raise ValueError(
                f"{state_path}: checkpoint is for n={saved_n}, "
                f"chunk_log2={saved_log2}; this job has n={n}, "
                f"chunk_log2={chunk_log2}")
        start = int(next_chunk)
        total = Jac(*(jnp.asarray(v).reshape(cs.fp.n_limbs, 1)
                      for v in coords))

    run = msm_fast if use_fast else msm
    for k in range(start, n_chunks):
        lo, hi = k * chunk, min((k + 1) * chunk, n)
        part = run(cs, point.Affine(points.x[:, lo:hi], points.y[:, lo:hi]),
                   scalars[:, lo:hi], c)
        total = part if total is None else point.jac_add(cs, total, part)
        _save_state(state_path, chunk_log2, n, k + 1, _jac_to_host(cs, total))

    if total is None:  # n == 0
        total = Jac(mont.zeros(cs.fp, (1,)), mont.one(cs.fp, (1,)),
                    mont.zeros(cs.fp, (1,)))
    if os.path.exists(state_path):
        os.remove(state_path)
    return total
