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


def _max_launch_k():
    """Stacked-vector cap per combined launch: the serial-bucket MSM's
    lane pool holds ~k*W*NB bucket lanes + slack, bounded by the VMEM cap
    (advisor r2 item 4) — chunk proof groups below msm_serial's limit."""
    from ..ops.msm_serial import max_stack_k
    return max_stack_k()


def _drive_lockstep(gens):
    """Run prover generators in lockstep, combining same-table MSM requests
    into chunked multi-proof launches.  Each proof's request sequence is
    identical (same circuit), so requests group naturally per step."""
    import jax.numpy as jnp

    import numpy as np

    live = {i: g for i, g in enumerate(gens)}
    resps = {i: None for i in live}
    results = {}
    while live:
        reqs = {}
        enc_reqs = {}
        fetches = {}
        ipa_reqs = {}
        for i in list(live):
            try:
                kind, table, dig = live[i].send(resps[i])
                if kind == "fetch":
                    fetches[i] = dig
                elif kind == "fused_ipa":
                    ipa_reqs[i] = (table, dig)
                elif kind == "msm_enc":
                    enc_reqs[i] = (table, dig)
                else:
                    assert kind == "msm"
                    reqs[i] = (table, dig)
            except StopIteration as stop:
                results[i] = stop.value
                del live[i]
        # cross-proof batched IPA: one stacked MSM launch per round for
        # the whole group (ops/ipa_fused.create_batched)
        if ipa_reqs:
            from ..ops import ipa_fused
            by_table = {}
            for i, (table, args) in ipa_reqs.items():
                by_table.setdefault(id(table), (table, []))[1].append(
                    (i, args))
            for table, items in by_table.values():
                idxs = [i for i, _ in items]
                argl = [a for _, a in items]
                outs = ipa_fused.create_batched(
                    [a[0] for a in argl], table,
                    [a[1] for a in argl], [a[2] for a in argl],
                    [a[3] for a in argl], [a[4] for a in argl],
                    [a[5] for a in argl])
                for i, out in zip(idxs, outs):
                    resps[i] = out
        # encoded MSMs (A_I/A_O/S waves): stack the whole group's digit
        # matrices into combined launches, compress on device, hand each
        # proof its 32-byte encodings — one dispatch wave + one readback
        # per <= k_cap stacked vectors for the entire batch
        if enc_reqs:
            k_cap = _max_launch_k()
            by_table = {}
            for i, (table, dig) in enc_reqs.items():
                by_table.setdefault(id(table), (table, []))[1].append(
                    (i, dig))
            for table, items in by_table.values():
                group, ks = [], 0
                flush_list = [group]
                for i, dig in items:
                    k = dig.shape[0] // 32
                    if ks + k > k_cap and group:
                        group = []
                        flush_list.append(group)
                        ks = 0
                    group.append((i, dig, k))
                    ks += k
                pendings = []
                for group in flush_list:
                    if not group:
                        continue
                    combined = jnp.concatenate([d for _, d, _ in group],
                                               axis=0)
                    pendings.append((group,
                                     table.msm_digits_enc_launch(combined)))
                for group, pend in pendings:
                    encs = table.msm_digits_enc_finish(pend)
                    off = 0
                    for i, _, k in group:
                        resps[i] = encs[off:off + k]
                        off += k
        # combine readbacks: one transfer per same-shape group
        if fetches:
            by_shape = {}
            for i, arr in fetches.items():
                by_shape.setdefault(arr.shape, []).append((i, arr))
            for items in by_shape.values():
                stacked = np.asarray(jnp.stack([a for _, a in items]))
                for (i, _), row in zip(items, stacked):
                    resps[i] = row
        if not reqs:
            if fetches or ipa_reqs or enc_reqs:
                continue
            break
        # group by table, chunk by stacked k
        k_cap = _max_launch_k()
        by_table = {}
        for i, (table, dig) in reqs.items():
            by_table.setdefault(id(table), (table, []))[1].append((i, dig))
        for table, items in by_table.values():
            group, ks = [], 0
            flush_list = [group]
            for i, dig in items:
                k = dig.shape[0] // 32
                if ks + k > k_cap and group:
                    group = []
                    flush_list.append(group)
                    ks = 0
                group.append((i, dig, k))
                ks += k
            can_async = hasattr(table, "msm_digits_launch")
            pendings = []
            for group in flush_list:
                if not group:
                    continue
                combined = jnp.concatenate([d for _, d, _ in group], axis=0)
                if can_async:
                    # dispatch every chunk before any readback: launches
                    # overlap on device, the host pays one round-trip wave
                    pendings.append((group, table.msm_digits_launch(
                        combined)))
                else:
                    pendings.append((group, table.msm_digits(combined)))
            for group, pend in pendings:
                pts = (table.msm_digits_finish(pend) if can_async
                       else pend)
                off = 0
                for i, _, k in group:
                    resps[i] = pts[off:off + k]
                    off += k
    return [results[i] for i in range(len(gens))]


def prove_batch(name, instance, witnesses, gadgets):
    """Prove one circuit over a batch of witness sets.  The proofs advance
    in lockstep: each phase's table MSMs (A_I/A_O/S, every IPA round's L/R)
    combine across proofs into one device launch per <= max_stack_k()
    stacked vectors — per-witness launch/readback overhead amortizes
    (SURVEY.md §2.C DP row; the reference proves strictly one statement at
    a time, bin/prover.rs)."""
    from .prove import prove_prepared

    needs_hash = any(op in gadgets for op in ("HASH", "MERKLE", "SET_MEMBER"))
    if needs_hash:
        values = []
        for w in witnesses:
            values.extend(_witness_values(w))
        for line in instance.splitlines():
            if line.strip():
                values.append(parse_assignment(line)[1])
        warm_image_cache(values)

    prepared = []
    for w in witnesses:
        coms = []
        prover, bp_gens, nc = prove_prepared(name, instance, w, gadgets,
                                             coms)
        prepared.append((prover, bp_gens, nc, coms))

    gens = [prover.prove_gen(bp_gens) for prover, bp_gens, _, _ in prepared]
    proofs = _drive_lockstep(gens)
    return [(proof.to_bytes(), nc, "".join(coms))
            for proof, (_, _, nc, coms) in zip(proofs, prepared)]


def verify_batch(name, instance, proofs_and_coms, gadgets):
    return [verify(name, instance, proof, coms, gadgets)
            for proof, coms in proofs_and_coms]
