"""Inner-product argument, byte/transcript-compatible with
bulletproofs::inner_product_proof (dalek 2.x, `yoloproofs` feature as pinned
by the reference's Cargo.toml:19-22).

Host code sequences the log2(n) Fiat-Shamir rounds (inherently serial); the
two MSMs per round and the vector folds are bulk math routed through
core.msm / the ops backend.
"""

from .scalar import Scalar, batch_invert
from .ristretto import RistrettoPoint
from .transcript import (innerproduct_domain_sep, append_point,
                         validate_and_append_point, challenge_scalar,
                         ProofError)
from .msm import msm


def _inner_product(a, b) -> Scalar:
    acc = Scalar.zero()
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


class InnerProductProof:
    __slots__ = ("L_vec", "R_vec", "a", "b")

    def __init__(self, L_vec, R_vec, a: Scalar, b: Scalar):
        self.L_vec = L_vec  # list[bytes] compressed points
        self.R_vec = R_vec
        self.a = a
        self.b = b

    @staticmethod
    def create(transcript, Q: RistrettoPoint, G_factors, H_factors,
               G, H, a, b) -> "InnerProductProof":
        """Mirrors InnerProductProof::create (inner_product_proof.rs).

        G, H: lists of RistrettoPoint; a, b: lists of Scalar; factors: Scalar.
        All lists have length n (power of two).
        """
        n = len(G)
        assert n == len(H) == len(a) == len(b)
        assert n == len(G_factors) == len(H_factors)
        assert n & (n - 1) == 0, "n must be a power of two"

        innerproduct_domain_sep(transcript, n)

        L_vec, R_vec = [], []

        if n != 1:
            # First fold unrolls the G/H factor multiplication.
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            G_L, G_R = G[:n], G[n:]
            H_L, H_R = H[:n], H[n:]

            c_L = _inner_product(a_L, b_R)
            c_R = _inner_product(a_R, b_L)

            L = msm(
                [x * g for x, g in zip(a_L, G_factors[n:2 * n])]
                + [x * h for x, h in zip(b_R, H_factors[0:n])] + [c_L],
                G_R + H_L + [Q]).compress()
            R = msm(
                [x * g for x, g in zip(a_R, G_factors[0:n])]
                + [x * h for x, h in zip(b_L, H_factors[n:2 * n])] + [c_R],
                G_L + H_R + [Q]).compress()

            append_point(transcript, b"L", L)
            append_point(transcript, b"R", R)
            L_vec.append(L)
            R_vec.append(R)

            u = challenge_scalar(transcript, b"u")
            u_inv = u.invert()

            a = [a_L[i] * u + u_inv * a_R[i] for i in range(n)]
            b = [b_L[i] * u_inv + u * b_R[i] for i in range(n)]
            G = [msm([u_inv * G_factors[i], u * G_factors[n + i]],
                     [G_L[i], G_R[i]]) for i in range(n)]
            H = [msm([u * H_factors[i], u_inv * H_factors[n + i]],
                     [H_L[i], H_R[i]]) for i in range(n)]

        while n != 1:
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            G_L, G_R = G[:n], G[n:]
            H_L, H_R = H[:n], H[n:]

            c_L = _inner_product(a_L, b_R)
            c_R = _inner_product(a_R, b_L)

            L = msm(a_L + b_R + [c_L], G_R + H_L + [Q]).compress()
            R = msm(a_R + b_L + [c_R], G_L + H_R + [Q]).compress()

            append_point(transcript, b"L", L)
            append_point(transcript, b"R", R)
            L_vec.append(L)
            R_vec.append(R)

            u = challenge_scalar(transcript, b"u")
            u_inv = u.invert()

            a = [a_L[i] * u + u_inv * a_R[i] for i in range(n)]
            b = [b_L[i] * u_inv + u * b_R[i] for i in range(n)]
            G = [msm([u_inv, u], [G_L[i], G_R[i]]) for i in range(n)]
            H = [msm([u, u_inv], [H_L[i], H_R[i]]) for i in range(n)]

        return InnerProductProof(L_vec, R_vec, a[0], b[0])

    def verification_scalars(self, n: int, transcript):
        """(u_sq, u_inv_sq, s) for the verifier's single mega-MSM."""
        lg_n = len(self.L_vec)
        if lg_n >= 32:
            raise ProofError("inner product proof too large")
        if n != (1 << lg_n):
            raise ProofError("n does not match proof size")

        innerproduct_domain_sep(transcript, n)

        challenges = []
        for Lb, Rb in zip(self.L_vec, self.R_vec):
            validate_and_append_point(transcript, b"L", Lb)
            validate_and_append_point(transcript, b"R", Rb)
            challenges.append(challenge_scalar(transcript, b"u"))

        allinv, challenges_inv = batch_invert(challenges)
        challenges_sq = [u * u for u in challenges]
        challenges_inv_sq = [u * u for u in challenges_inv]

        s = [allinv]
        for i in range(1, n):
            lg_i = i.bit_length() - 1
            k = 1 << lg_i
            u_lg_i_sq = challenges_sq[(lg_n - 1) - lg_i]
            s.append(s[i - k] * u_lg_i_sq)

        return challenges_sq, challenges_inv_sq, s

    # -- serialization (dalek layout: L0 R0 L1 R1 ... a b) -----------------
    def to_bytes(self) -> bytes:
        out = bytearray()
        for Lb, Rb in zip(self.L_vec, self.R_vec):
            out += Lb
            out += Rb
        out += self.a.as_bytes()
        out += self.b.as_bytes()
        return bytes(out)

    @staticmethod
    def from_bytes(data: bytes) -> "InnerProductProof":
        if len(data) % 32 != 0:
            raise ProofError("IPP bytes not a multiple of 32")
        num = len(data) // 32
        if num < 2:
            raise ProofError("IPP too short")
        lg_n = (num - 2) // 2
        if num != 2 * lg_n + 2:
            raise ProofError("IPP malformed")
        L_vec, R_vec = [], []
        for i in range(lg_n):
            L_vec.append(data[64 * i:64 * i + 32])
            R_vec.append(data[64 * i + 32:64 * i + 64])
        if lg_n >= 32:
            raise ProofError("IPP too large")
        a = _from_canonical(data[-64:-32])
        b = _from_canonical(data[-32:])
        return InnerProductProof(L_vec, R_vec, a, b)


def _from_canonical(b32: bytes) -> Scalar:
    """Scalar::from_canonical_bytes: rejects values >= l (FormatError)."""
    v = int.from_bytes(b32, "little")
    from .scalar import L as _L
    if v >= _L:
        raise ProofError("non-canonical scalar")
    return Scalar(v)
