"""2^20-gens 512-leaf Merkle stress (reference merkle_tree_gadget.rs:474,
#[ignore]d) on the real chip, with wall time + peak RSS recorded."""
import sys, os, time, resource
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["BPG_RUN_512"] = "1"
os.environ["BPG_TPU_TESTS_ON_TPU"] = "1"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import test_gadget_units_ref as t

t0 = time.time()
t.test_merkle_tree_gadget_512()
dt = time.time() - t0
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"512-leaf Merkle (2^20 gens): PROVE+VERIFY OK in {dt:.1f}s, "
      f"host peak RSS {rss:.1f} GB", flush=True)
