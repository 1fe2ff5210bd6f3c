"""Ristretto255 pinned against RFC 9496 test vectors (same group as
curve25519-dalek, whose encodings the reference's .coms files carry)."""
import hashlib

from bulletproof_gadgets_tpu.core.ristretto import (
    RISTRETTO_BASEPOINT, RISTRETTO_BASEPOINT_COMPRESSED, RistrettoPoint, P, D,
    SQRT_M1)

# RFC 9496 §A.1 "Multiples of the generator"
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
    "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
    "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
    "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
    "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
    "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
    "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
    "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e",
]

# RFC 9496 §A.2 invalid encodings (a sample)
BAD_ENCODINGS = [
    # Non-canonical field encodings.
    "00ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
    "f3ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
    "edffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
    # Negative field elements.
    "0100000000000000000000000000000000000000000000000000000000000000",
    "01ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
    # Non-square x^2.
    "26948d35ca62e643e26a83177332e6b6afeb9d08e4268b650f1f5bbd8d81d371",
    # s = -1, which causes y = 0.
    "ecffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff7f",
]


def test_constants_consistency():
    assert (SQRT_M1 * SQRT_M1 + 1) % P == 0
    assert D == 37095705934669439343138083508754565189542113879843219016388785533085940283555


def test_generator_encoding():
    assert RISTRETTO_BASEPOINT_COMPRESSED.hex() == SMALL_MULTIPLES[1]


def test_small_multiples():
    acc = RistrettoPoint.identity()
    for i, expected in enumerate(SMALL_MULTIPLES):
        assert acc.compress().hex() == expected, f"multiple {i}"
        acc = acc + RISTRETTO_BASEPOINT


def test_decompress_roundtrip():
    for expected in SMALL_MULTIPLES:
        point = RistrettoPoint.decompress(bytes.fromhex(expected))
        assert point is not None
        assert point.compress().hex() == expected


def test_bad_encodings_rejected():
    for bad in BAD_ENCODINGS:
        assert RistrettoPoint.decompress(bytes.fromhex(bad)) is None


def test_scalar_mul_matches_additions():
    p5 = RISTRETTO_BASEPOINT.scalar_mul(5)
    assert p5.compress().hex() == SMALL_MULTIPLES[5]


def test_hash_to_group_vectors():
    # RFC 9496 §A.3 (dalek RistrettoPoint::hash_from_bytes::<Sha512>)
    vectors = [
        (b"Ristretto is traditionally a short shot of espresso coffee",
         "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46"),
        (b"made with the finest ground beans, fairly traded, and brewed",
         None),
    ]
    msg, expected = vectors[0]
    h = hashlib.sha512(msg).digest()
    point = RistrettoPoint.from_uniform_bytes(h)
    assert point.compress().hex() == expected


def test_pedersen_default_gens():
    # B_blinding = hash_from_bytes::<Sha3_512>(B.compress()) — dalek constant.
    from bulletproof_gadgets_tpu.core.gens import PedersenGens
    pc = PedersenGens.default()
    assert pc.B_blinding.compress().hex() == (
        "8c9240b456a9e6dc65c377a1048d745f94a08cdb7f44cbcd7b46f34048871134")
