"""ntedit_tpu — a TPU-native genome polishing & SNV detection framework.

A from-scratch re-design of the capabilities of bcgsc/ntEdit v2.1.1
(reference layout documented in SURVEY.md) built on JAX/XLA/Pallas:
dense prefix-scan rolling-hash flagging, HBM-resident Bloom filters,
and a batched edit state machine over sharded contig windows.
"""

__version__ = "0.1.0"
