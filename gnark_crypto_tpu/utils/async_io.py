"""Async/double-buffered host->device IO (SURVEY.md §2.8 P6).

The reference overlaps deserialization with consumption via AsyncReadFrom
(ecc/bn254/fr/vector.go:76: a goroutine fills the slice while a channel
signals readiness).  The TPU analogue overlaps three stages:

  disk read (reader thread) -> host staging buffer -> jax.device_put (async)

jax.device_put returns immediately (transfers are enqueued on the device
stream), so issuing per-chunk puts from the consumer loop while the reader
thread fills the next chunk keeps disk, PCIe/tunnel, and device busy
simultaneously.  The final on-device concatenate is lazy too.
"""

from __future__ import annotations

import json
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

_HEADER_MAGIC = b"GCTPU-RAW1"


def write_limb_array(path: str, arr) -> None:
    """Raw dump: JSON header (shape, dtype) + C-order bytes.  The analogue of
    utils/unsafe.WriteSlice (dump_slice.go:16) minus the arch-dependence."""
    host = np.asarray(arr)
    hdr = json.dumps({"shape": list(host.shape), "dtype": str(host.dtype)})
    with open(path, "wb") as f:
        f.write(_HEADER_MAGIC)
        hb = hdr.encode()
        f.write(len(hb).to_bytes(4, "big"))
        f.write(hb)
        host.tofile(f)


def read_limb_array_async(path: str, chunk_bytes: int = 1 << 24):
    """Streaming load: a reader thread fills chunks while the caller's device
    transfers are in flight (AsyncReadFrom, vector.go:76).  Returns the full
    array on the default device; transfers overlap the remaining reads."""
    f = open(path, "rb")
    assert f.read(len(_HEADER_MAGIC)) == _HEADER_MAGIC, "bad raw header"
    hlen = int.from_bytes(f.read(4), "big")
    hdr = json.loads(f.read(hlen).decode())
    shape = tuple(hdr["shape"])
    dtype = np.dtype(hdr["dtype"])
    total = int(np.prod(shape)) * dtype.itemsize
    # chunks must split on element boundaries (np.frombuffer rejects partial
    # items), and a short read must fail loudly, not as a reshape error later
    chunk_bytes = max(dtype.itemsize,
                      chunk_bytes - chunk_bytes % dtype.itemsize)

    q: "queue.Queue[bytes | None]" = queue.Queue(maxsize=2)  # double buffer

    def reader():
        remaining = total
        while remaining > 0:
            buf = f.read(min(chunk_bytes, remaining))
            if not buf:
                break
            remaining -= len(buf)
            q.put(buf)
        q.put(None)
        f.close()

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    parts = []
    received = 0
    while True:
        buf = q.get()
        if buf is None:
            break
        received += len(buf)
        host = np.frombuffer(buf, dtype=dtype)
        parts.append(jax.device_put(host))   # async: enqueued, not awaited
    t.join()
    if received != total:
        raise EOFError(
            f"{path}: short read, got {received} of {total} bytes")
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return flat.reshape(shape)


def srs_dump_raw(srs, path_prefix: str) -> None:
    """Raw SRS dump split per array (WriteDump, kzg/marshal.go:77): the G1
    powers stream back without per-element decoding."""
    write_limb_array(path_prefix + ".g1x.raw", srs.pk.g1.x)
    write_limb_array(path_prefix + ".g1y.raw", srs.pk.g1.y)
    with open(path_prefix + ".vk.json", "w") as f:
        json.dump(
            {
                "curve": srs.vk.curve,
                "g1": [str(v) for v in srs.vk.g1],
                "g2": [[[str(x) for x in c] for c in pt] for pt in srs.vk.g2],
            },
            f,
        )


def srs_load_raw_async(path_prefix: str, chunk_bytes: int = 1 << 24):
    """ReadDump analogue with overlapped IO (P6): both coordinate streams
    load through the double-buffered reader."""
    from ..commit.kzg import SRS, ProvingKey, VerifyingKey
    from ..curves import point as gp

    x = read_limb_array_async(path_prefix + ".g1x.raw", chunk_bytes)
    y = read_limb_array_async(path_prefix + ".g1y.raw", chunk_bytes)
    with open(path_prefix + ".vk.json") as f:
        meta = json.load(f)
    vk = VerifyingKey(
        g1=tuple(int(v) for v in meta["g1"]),
        g2=tuple(
            tuple(tuple(int(x_) for x_ in c) for c in pt) for pt in meta["g2"]
        ),
        curve=meta["curve"],
    )
    return SRS(pk=ProvingKey(g1=gp.Affine(x, y)), vk=vk)
