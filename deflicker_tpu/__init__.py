"""deflicker_tpu — a TPU-native blind video deflickering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ChenyangLEI/All-In-One-Deflicker ("Blind Video Deflickering by Neural
Filtering with a Flawed Atlas", CVPR 2023):

  stage 0: video <-> frame I/O on host (`deflicker_tpu.io`)
  stage 0.5: RAFT optical flow, batched over frame pairs (`deflicker_tpu.flow`)
  stage 1: per-video test-time fit of a neural layered atlas
           (`deflicker_tpu.atlas`) — coordinate MLPs trained with
           rgb/flow/rigidity/gradient losses over sampled (x,y,t) pixels,
           fully on device via a scanned, fused train step
  stage 2: feed-forward neural filter (U-Net) + sequential local
           refinement (ConvLSTM net) (`deflicker_tpu.filter`)

Parallelism lives in `deflicker_tpu.parallel`: a single `jax.sharding.Mesh`
with batch-sharded atlas fitting, frame-sharded rendering/filtering and
pair-sharded flow, relying on XLA SPMD collectives over ICI.
"""

__version__ = "0.1.0"
