"""Host big-int ate-pairing oracle, generic over any pairing stack.

Textbook Miller loop on the untwisted curve over the full extension field +
full-exponent final exponentiation (p^k - 1)/r — slow and transparently
correct, the independent-reimplementation oracle for pairing/ate.py
(the generic-family analogue of towers/reference.py PairingOracle).
"""

from __future__ import annotations

import functools

from ..towers.stacks import PairingStack


class GenericAteOracle:
    def __init__(self, st: PairingStack):
        self.st = st
        self.K = st.host_full      # full field host ops
        self.T = st.host_tf        # twist field host ops

    # ---- E(K) affine helpers ----------------------------------------------

    def _add(self, A, B):
        f = self.K
        if A is None:
            return B
        if B is None:
            return A
        x1, y1 = A
        x2, y2 = B
        if f.eq(x1, x2):
            if f.is_zero(f.add(y1, y2)):
                return None
            num = f.mul_small(f.square(x1), 3)
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        x3 = f.sub(f.sub(f.square(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def _line(self, A, B, P):
        f = self.K
        if A is None or B is None:
            return f.one()
        xp, yp = P
        x1, y1 = A
        x2, y2 = B
        if f.eq(x1, x2) and f.is_zero(f.add(y1, y2)):
            return f.sub(xp, x1)
        if f.eq(x1, x2) and f.eq(y1, y2):
            num = f.mul_small(f.square(x1), 3)
            den = f.add(y1, y1)
        else:
            num = f.sub(y2, y1)
            den = f.sub(x2, x1)
        lam = f.mul(num, f.inv(den))
        return f.sub(f.sub(yp, y1), f.mul(lam, f.sub(xp, x1)))

    # ---- twist embedding ----------------------------------------------------

    def _embed_tf(self, x):
        """Twist-field element -> full field (tf = cubic-part coefficient 0)."""
        K, T = self.K, self.T
        if self.st.tf is self.st.fp:  # bw6: tf == Fp
            return K.embed(x)
        # K = Quad(Cubic(T)): embed as ((x, 0, 0), (0, 0, 0))
        cubic = K.base
        return K.embed_base(cubic.embed_base(x))

    def untwist(self, Q):
        """E'(tf) -> E(K): D: (x w^2, y w^3); M: (x/w^2, y/w^3)."""
        f = self.K
        x, y = self._embed_tf(Q[0]), self._embed_tf(Q[1])
        w = f.gen()          # sextic generator (w^2 = v_cubic)
        w2 = f.square(w)
        w3 = f.mul(w2, w)
        if self.st.twist == "D":
            return (f.mul(x, w2), f.mul(y, w3))
        return (f.mul(x, f.inv(w2)), f.mul(y, f.inv(w3)))

    # ---- pairing -------------------------------------------------------------

    def miller_loop(self, P, Q):
        """P: (x, y) Fp ints on E(Fp); Q: (x, y) tf elements on E'(tf)."""
        f = self.K
        st = self.st
        P12 = (f.embed(P[0]), f.embed(P[1]))
        Qu = self.untwist(Q)
        if st.family == "bw6":
            return self._miller_loop_bw6(P12, Q, Qu)
        T = Qu
        m = st.loop_const
        acc = f.one()
        for bit in bin(abs(m))[3:]:
            acc = f.square(acc)
            acc = f.mul(acc, self._line(T, T, P12))
            T = self._add(T, T)
            if bit == "1":
                acc = f.mul(acc, self._line(T, Qu, P12))
                T = self._add(T, Qu)
        if st.family == "bn":
            frob = lambda A: (f.frobenius(A[0]), f.frobenius(A[1]))
            Q1 = frob(Qu)
            Q2 = frob(Q1)
            Q2 = (Q2[0], f.neg(Q2[1]))
            acc = f.mul(acc, self._line(T, Q1, P12))
            T = self._add(T, Q1)
            acc = f.mul(acc, self._line(T, Q2, P12))
            T = self._add(T, Q2)
        elif m < 0:
            acc = f.conj(acc)
        return acc

    def _miller_loop_bw6(self, P12, Q, Qu):
        """BW6 optimal 2-loop (same joint NAF ladder as ate.py
        _miller_loop_bw6, on the untwisted curve)."""
        from .ate import _bw6_params

        f = self.K
        st = self.st
        omega, flip, d0, d1 = _bw6_params(st)
        q1_t = (Q[0] * omega % st.p, (-Q[1]) % st.p)
        Q1u = self.untwist(q1_t)
        neg = lambda A: (A[0], f.neg(A[1]))
        T = Q1u
        acc = f.one()
        for i in range(len(d0) - 1, -1, -1):
            acc = f.square(acc)
            acc = f.mul(acc, self._line(T, T, P12))
            T = self._add(T, T)
            for dig, base_pt in ((int(d1[i]), Q1u), (int(d0[i]), Qu)):
                if dig == 0:
                    continue
                A = base_pt if dig > 0 else neg(base_pt)
                acc = f.mul(acc, self._line(T, A, P12))
                T = self._add(T, A)
        return f.conj(acc) if flip else acc

    @functools.cached_property
    def final_exp_exponent(self) -> int:
        """(p^k - 1)/r times the family hard-part multiple, matching the
        reference's FinalExponentiation output exactly: the bn ladder
        (pairing.go:78, eprint 2015/192) exponentiates by an extra
        2x0(6x0^2+3x0+1); the bls12/bls24 HHT ladders (eprint 2020/875) by an
        extra 3; bw6 by the El Housni-Guillevic cofactor s (|x0+1| for
        bw6-761, |x0^5-x0^4-x0| at the SIGNED seed x0 for bw6-633 —
        ecc/bw6-633/bw6-633.go:102)."""
        st = self.st
        base = (st.p ** st.embedding_degree - 1) // st.r
        if st.family == "bn":
            x0 = st.seed
            return base * (2 * x0 * (6 * x0 * x0 + 3 * x0 + 1))
        if st.family in ("bls12", "bls24"):
            return base * 3
        x0 = st.seed
        s = abs(x0 + 1) if st.name == "bw6_761" else abs(x0**5 - x0**4 - x0)
        return base * s

    def final_exp(self, x):
        return self.K.pow(x, self.final_exp_exponent)

    def pair(self, P, Q):
        return self.final_exp(self.miller_loop(P, Q))
