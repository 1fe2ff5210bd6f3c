#!/usr/bin/env bash
# CI merge gate — the committed equivalent of the reference's two GitHub
# workflows (/root/reference/.github/workflows/build.yml and
# integration_tests.yml), plus the multichip contract this framework adds.
#
# Runs entirely on CPU (virtual 8-device mesh), exits nonzero on any drift:
#   1. fast pytest suite — unit + gadget-parity + golden proof-byte pins
#      (the dalek wire contract for all 13 statements, TPU==CPU)
#   2. multichip dryrun — sharded prove+verify over 8 virtual devices,
#      proof bytes checked against the single-device oracle
#   3. CLI end-to-end — prover/verifier binaries on the shipped example
#      statement via the .inst/.wtns/.coms/.proof file contract
#   4. statement sweep — all 13 reference resource statements prove+verify
#      (integration_tests.yml parity).  The sweep runs the big MiMC/Merkle
#      circuits and takes ~30-60 min on CPU; set BPG_CI_FAST=1 to restrict
#      it to the sub-second statements (the full suite remains the gate).
#
# Usage: scripts/ci_gate.sh           # full gate
#        BPG_CI_FAST=1 scripts/ci_gate.sh
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
case "${XLA_FLAGS:-}" in
  *xla_force_host_platform_device_count*) ;;
  *) export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8" ;;
esac

echo "== [1/4] fast test suite (incl. golden proof-byte pins) =="
python -m pytest tests/ -q

echo "== [2/4] multichip dryrun (8 virtual devices, byte-parity) =="
python - <<'EOF'
import __graft_entry__ as g
g.dryrun_multichip(8)
EOF

echo "== [3/4] CLI end-to-end (example statement, file contract) =="
tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT
cp /root/reference/example.inst /root/reference/example.wtns \
   /root/reference/example.gadgets "$tmp/"
repo=$(pwd)
(cd "$tmp" && PYTHONPATH="$repo" python -m bulletproof_gadgets_tpu.cli.prover example)
out=$(cd "$tmp" && PYTHONPATH="$repo" python -m bulletproof_gadgets_tpu.cli.verifier example)
echo "verifier: $out"
[ "$out" = "true" ] || { echo "CLI verify failed" >&2; exit 1; }

echo "== [4/4] statement sweep (reference integration_tests.yml parity) =="
if [ "${BPG_CI_FAST:-0}" = "1" ]; then
  python scripts/run_all_statements.py equality inequality bounds_check \
    less_than or3
else
  python scripts/run_all_statements.py
fi

echo "CI gate: ALL GREEN"
