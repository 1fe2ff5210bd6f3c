"""Batched-witness proving — the DP axis (SURVEY.md §2.C).

The reference proves one statement at a time (bin/prover.rs); a production
deployment proves the SAME `.gadgets` circuit over many witness sets.  The
Fiat-Shamir transcript serializes each individual proof, but across a batch
the witness-side work batches:

  * all MiMC witness/instance hashing across the batch runs as ONE device
    sponge kernel per block-size group (ops/mimc_kernels.mimc_hash_batch),
    seeding models.mimc's image cache before any prove starts;
  * every proof shares the process-wide device generator table and the
    XLA-compiled MSM shapes (one circuit -> one shape set: the first
    witness pays the compile, the rest are warm);
  * proofs are independent once images are cached — on a multi-device
    mesh, witnesses can be proved concurrently (batch mesh axis).

API mirrors lang.prove/lang.verify per element:
  prove_batch(name, instance, [witness...], gadgets)
      -> [(proof_bytes, num_constraints, coms_str), ...]
  verify_batch(name, instance, [(proof, coms)...], gadgets) -> [bool, ...]
"""
from ..models import mimc
from .assignments import parse_assignment
from .prove import prove
from .verify import verify


def _witness_values(witness: str):
    for line in witness.splitlines():
        if line.strip():
            yield parse_assignment(line)[1]


def warm_image_cache(byte_values) -> int:
    """Device-hash every byte string and seed models.mimc._image_cache.
    Returns the number of images computed."""
    from ..ops.mimc_kernels import mimc_hash_batch

    todo = [b for b in dict.fromkeys(byte_values)
            if b not in mimc._image_cache]
    if not todo:
        return 0
    for data, image in zip(todo, mimc_hash_batch(todo)):
        mimc._image_cache[data] = image
    return len(todo)


def prove_batch(name, instance, witnesses, gadgets):
    """Prove one circuit over a batch of witness sets."""
    needs_hash = any(op in gadgets for op in ("HASH", "MERKLE", "SET_MEMBER"))
    if needs_hash:
        values = []
        for w in witnesses:
            values.extend(_witness_values(w))
        for line in instance.splitlines():
            if line.strip():
                values.append(parse_assignment(line)[1])
        warm_image_cache(values)

    out = []
    for w in witnesses:
        coms = []
        proof, nc = prove(name, instance, w, gadgets, coms)
        out.append((proof, nc, "".join(coms)))
    return out


def verify_batch(name, instance, proofs_and_coms, gadgets):
    return [verify(name, instance, proof, coms, gadgets)
            for proof, coms in proofs_and_coms]
