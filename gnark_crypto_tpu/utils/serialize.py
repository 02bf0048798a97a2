"""Serialization / checkpoint utilities.

The reference expresses checkpoint/resume as io.WriterTo/ReaderFrom on every
heavy object (SURVEY.md §5): fft.Domain.WriteTo (fr/fft/domain.go:247), KZG
SRS marshal incl. the raw-memory WriteDump/ReadDump fast path
(ecc/bn254/kzg/marshal.go:77-98, utils/unsafe/dump_slice.go:16), and a
streaming Encoder/Decoder over curve objects (ecc/bn254/marshal.go:57-772).

TPU-native equivalents here:
- Domain: serialize the defining integers, recompute device tables on load
  (tables are pure functions of (field, cardinality) — cheaper to rebuild
  than to ship, and the bytes stay arch-independent, unlike utils/unsafe).
- SRS dump/load: numpy .npz of the SoA limb arrays — the raw-dump analogue
  (zero per-element work, memory-layout exact).
- Encoder/Decoder: length-prefixed streaming of fr vectors and compressed /
  uncompressed G1 points (flag bits per marshal.go:25-56).
"""

from __future__ import annotations

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import marshal as cmarshal
from ..curves import point as gp
from ..curves.spec import CurveSpec
from ..fields import mont
from ..fields.fields import get_spec
from ..fft.domain import Domain

_MAGIC_DOMAIN = b"GCTD"
_MAGIC_SRS = b"GCTS"


# ---------------------------------------------------------------------------
# fft.Domain
# ---------------------------------------------------------------------------


def domain_write(d: Domain, w: io.BufferedIOBase) -> None:
    """Domain.WriteTo analogue: the defining constants, not the tables."""
    name = d.spec.name.encode()
    w.write(_MAGIC_DOMAIN)
    w.write(struct.pack("<HQB", len(name), d.cardinality,
                        1 if d.coset_table is not None else 0))
    w.write(name)


def domain_read(r: io.BufferedIOBase) -> Domain:
    assert r.read(4) == _MAGIC_DOMAIN, "bad domain header"
    nlen, card, with_coset = struct.unpack("<HQB", r.read(11))
    name = r.read(nlen).decode()
    return Domain(get_spec(name), card, with_coset_tables=bool(with_coset))


# ---------------------------------------------------------------------------
# KZG SRS raw dump (WriteDump/ReadDump analogue)
# ---------------------------------------------------------------------------


def srs_dump(srs, path: str) -> None:
    """Raw dump of a kzg.SRS: SoA limb arrays verbatim (no per-element work).
    The arch-independent analogue of kzg/marshal.go:77 WriteDump."""
    vk = srs.vk
    g2 = np.array(
        [[list(c) for c in pt] for pt in vk.g2], dtype=object
    )
    np.savez(
        path,
        magic=np.frombuffer(_MAGIC_SRS, dtype=np.uint8),
        curve=np.frombuffer(vk.curve.encode(), dtype=np.uint8),
        pk_x=np.asarray(srs.pk.g1.x),
        pk_y=np.asarray(srs.pk.g1.y),
        vk_g1=np.array([str(vk.g1[0]), str(vk.g1[1])]),
        vk_g2=np.array(
            [[[str(x) for x in c] for c in pt] for pt in vk.g2]
        ),
    )
    del g2


def srs_load(path: str):
    from ..commit.kzg import SRS, ProvingKey, VerifyingKey

    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    assert z["magic"].tobytes() == _MAGIC_SRS, "bad srs header"
    curve = z["curve"].tobytes().decode()
    pk = ProvingKey(g1=gp.Affine(jnp.asarray(z["pk_x"]), jnp.asarray(z["pk_y"])))
    vk_g1 = tuple(int(s) for s in z["vk_g1"])
    vk_g2 = tuple(
        tuple(tuple(int(x) for x in c) for c in pt) for pt in z["vk_g2"]
    )
    return SRS(pk=pk, vk=VerifyingKey(g1=vk_g1, g2=vk_g2, curve=curve))


# ---------------------------------------------------------------------------
# streaming Encoder/Decoder (marshal.go:57-772 analogue)
# ---------------------------------------------------------------------------

_TAG_FR_VEC = 1
_TAG_G1_VEC_COMP = 2
_TAG_G1_VEC_RAW = 3


class Encoder:
    """Streaming encoder for fr vectors and G1 point vectors.

    write(obj) accepts:
    - (spec, jax/np array (n_limbs, N)) tuples -> big-endian fr elements;
    - (cs, Affine) -> compressed G1 (raw=True for uncompressed)."""

    def __init__(self, w: io.BufferedIOBase, raw: bool = False):
        self.w = w
        self.raw = raw
        self.n_written = 0

    def write_fr_vector(self, spec, arr) -> None:
        host = np.asarray(arr)
        n = host.shape[1] if host.ndim > 1 else 1
        ints = mont.to_ints(spec, host.reshape(spec.n_limbs, -1), mont=True)
        self.w.write(struct.pack("<BI", _TAG_FR_VEC, n))
        name = spec.name.encode()
        self.w.write(struct.pack("<H", len(name)))
        self.w.write(name)
        for v in ints:
            self.w.write(int(v).to_bytes(spec.bytes, "big"))
        self.n_written += 1

    def write_g1_vector(self, cs: CurveSpec, pts: gp.Affine) -> None:
        tag = _TAG_G1_VEC_RAW if self.raw else _TAG_G1_VEC_COMP
        host = gp.affine_to_ints(cs, pts)
        n = len(host)
        self.w.write(struct.pack("<BI", tag, n))
        name = cs.name.encode()
        self.w.write(struct.pack("<H", len(name)))
        self.w.write(name)
        for P in host:
            self.w.write(cmarshal.g1_to_bytes(cs, P, raw=self.raw))
        self.n_written += 1


class Decoder:
    def __init__(self, r: io.BufferedIOBase, subgroup_check: bool = True):
        self.r = r
        self.subgroup_check = subgroup_check

    def read(self):
        """Returns ('fr', spec, device array) or ('g1', cs, Affine)."""
        hdr = self.r.read(5)
        if not hdr:
            raise EOFError
        tag, n = struct.unpack("<BI", hdr)
        (nlen,) = struct.unpack("<H", self.r.read(2))
        name = self.r.read(nlen).decode()
        if tag == _TAG_FR_VEC:
            spec = get_spec(name)
            vals = [
                int.from_bytes(self.r.read(spec.bytes), "big") for _ in range(n)
            ]
            return ("fr", spec, mont.from_ints(spec, vals))
        from ..curves import spec as cspec

        cs = getattr(cspec, name)()
        size = cs.fp.bytes if tag == _TAG_G1_VEC_COMP else 2 * cs.fp.bytes
        pts = [
            cmarshal.g1_from_bytes(
                cs, self.r.read(size), subgroup_check=self.subgroup_check
            )
            for _ in range(n)
        ]
        return ("g1", cs, gp.affine_from_ints(cs, pts))


def partial_sums(arr):
    """utils.PartialSums analogue (utils/slices.go:13): inclusive prefix sums."""
    return np.cumsum(np.asarray(arr))
