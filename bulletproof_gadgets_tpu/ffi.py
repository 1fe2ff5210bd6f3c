"""Python half of the C ABI surface (native/bpg_ffi.c).

Mirrors the reference's FFI marshalling contract
(/root/reference/interfaces/ios/src/lib.rs:11-52 and
interfaces/android/src/lib.rs:84-108): inputs are the statement name plus
the raw text of the .inst/.wtns/.gadgets files (and .coms + proof bytes on
the verify side); outputs are the .coms text and serialized proof bytes.
"""
from .lang.prove import prove as _prove
from .lang.verify import verify as _verify


def ffi_prove(name: str, instance: str, witness: str, gadgets: str):
    """Returns (commitments_text, proof_bytes)."""
    coms: list = []
    proof, _num_constraints = _prove(name, instance, witness, gadgets, coms)
    return "".join(coms), bytes(proof)


def ffi_verify(name: str, instance: str, proof: bytes, commitments: str,
               gadgets: str) -> bool:
    try:
        return bool(_verify(name, instance, proof, commitments, gadgets))
    except Exception:
        # FFI boundary: malformed inputs surface as False, never a crash
        # (reference verify.rs:71-72 maps proof errors to Ok(false)).
        return False
