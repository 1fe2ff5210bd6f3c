#!/usr/bin/env python
"""Run every reference statement fixture end-to-end (prove -> verify), like
the reference CI integration workflow (.github/workflows/integration_tests.yml).

Usage: python scripts/run_all_statements.py [names...]
Defaults to all 13 resource statements + example.  Honors the ambient JAX
backend (TPU if available).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = "/root/reference/tests/resources"
ALL = ["equality", "inequality", "bounds_check", "less_than",
       "set_membership", "mimc_hash", "merkle_tree",
       "or", "or2", "or3", "or4", "or5", "example"]


def main():
    from bulletproof_gadgets_tpu.utils import rng
    from bulletproof_gadgets_tpu.lang.prove import prove
    from bulletproof_gadgets_tpu.lang.verify import verify

    rng.set_seed("run-all")
    names = sys.argv[1:] or ALL
    failures = []
    for name in names:
        base = ("/root/reference/example" if name == "example"
                else os.path.join(RES, name))
        with open(base + ".inst") as f:
            instance = f.read()
        with open(base + ".wtns") as f:
            witness = f.read()
        with open(base + ".gadgets") as f:
            gadgets = f.read()
        t0 = time.time()
        coms = []
        try:
            proof, nc = prove(name, instance, witness, gadgets, coms)
            t1 = time.time()
            ok = verify(name, instance, proof, "".join(coms), gadgets)
            t2 = time.time()
            # warm pass: same circuit again in-process (compiled shapes +
            # resident tables; the steady-state serving cost)
            coms2 = []
            proof2, _ = prove(name, instance, witness, gadgets, coms2)
            t3 = time.time()
            ok2 = verify(name, instance, proof2, "".join(coms2), gadgets)
            t4 = time.time()
            status = "ok" if (ok and ok2) else "VERIFY-FAILED"
            print(f"{name:16s} {status:14s} constraints={nc:6d} "
                  f"cold prove={t1-t0:7.2f}s verify={t2-t1:7.2f}s | "
                  f"warm prove={t3-t2:6.2f}s verify={t4-t3:6.2f}s "
                  f"proof={len(proof)}B", flush=True)
            if not (ok and ok2):
                failures.append(name)
        except Exception as e:
            print(f"{name:16s} ERROR {type(e).__name__}: {e}", flush=True)
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all statements verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
