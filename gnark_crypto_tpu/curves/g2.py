"""G2 groups for every pairing curve, as generic flat-Ops Weierstrass groups.

Reference: ecc/<curve>/g2.go (G2Affine/G2Jac types and their full group API).
Here G2 is just a curves/group.py Group whose coordinate field is the twist
field of the pairing stack:

  bn254 / bls12-*  : Fp2   (sextic twist over Fp2, g2.go)
  bls24-*          : Fp4   (sextic twist over Fp4, ecc/bls24-315/g2.go)
  bw6-*            : Fp    (sextic twist over Fp itself, ecc/bw6-761/g2.go)

All of point arithmetic, scalar mul, MSM (msm/generic.py) and batch affine
conversion come from the shared generic code.
"""

from __future__ import annotations

import functools

from ..fields.fields import get_spec
from ..towers.stacks import stack
from .group import Group

_FR = {
    "bn254": "bn254_fr",
    "bls12_381": "bls12_381_fr",
    "bls12_377": "bls12_377_fr",
    "bls24_315": "bls24_315_fr",
    "bls24_317": "bls24_317_fr",
    "bw6_761": "bw6_761_fr",
    "bw6_633": "bw6_633_fr",
}


@functools.cache
def g2_group(curve_name: str) -> Group:
    st = stack(curve_name)
    h = st.host_tf
    b = st.b_twist if not isinstance(st.b_twist, int) else h.embed(st.b_twist)
    gx, gy = st.g2_gen
    if isinstance(gx, int):
        gx, gy = h.embed(gx), h.embed(gy)
    return Group(
        name=f"{curve_name}_g2",
        ops=st.tf,
        fr=get_spec(_FR[curve_name]),
        a=h.zero(),
        b=b,
        gx=gx,
        gy=gy,
    )
