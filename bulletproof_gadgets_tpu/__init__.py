"""bulletproof_gadgets_tpu — a TPU-native Bulletproofs R1CS gadget framework.

A from-scratch reimplementation of the capabilities of
FairAds/bulletproof-gadgets (a Rust crate over dalek bulletproofs):
zero-knowledge gadget proofs over Ristretto255 with a `.gadgets`
mini-language front end — redesigned for TPU: the host sequences parsing,
transcripts and constraint logs; JAX/XLA kernels own all bulk field/group
math (limb-vectorized F_p, batched Edwards ops, Pippenger MSM, IPA rounds),
shardable over device meshes.

Layers (mirrors SURVEY.md §1):
  utils/   Keccak/STROBE/Merlin transcript, conversions, RNG
  core/    scalars, Ristretto group, generators, R1CS prover/verifier, IPA,
           proof serialization, op-recording constraint system
  ops/     TPU kernels: F_p limb arithmetic, curve ops, MSM, engine wiring
  models/  the gadget zoo (bounds_check, equality, inequality, less_than,
           set_membership, mimc_hash, merkle_tree, or) + native MiMC
  parallel/ multi-device sharding (mesh MSM/IPA)
  lang/    .gadgets/.inst/.wtns/.coms mini-language compiler + orchestrators
  cli/     prover / verifier command-line entry points
"""

from .ops import engine as _engine

_engine.register()

__version__ = "0.1.0"
