"""Parallel decode strategies (SURVEY.md §2.3):

- batch.py: data-parallel batched decode — image batches sharded over a
  device mesh ('data' axis), the DP row of the strategy table.
- halo.py:  MCU-row sharding of one image across devices with ppermute
  halo exchange for the chroma upsampler — the decoder's SP/CP analogue
  (BASELINE.json:11 config 5).
- mesh.py:  mesh construction + multi-host initialization helpers.
"""
