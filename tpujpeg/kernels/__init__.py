"""Pallas TPU kernels: the device compute path (SURVEY.md §1 L2/L3
successors). Every kernel has an interpret-mode path so config 1 stays
CPU-runnable (BASELINE.json:7) and the jnp reference in
tpujpeg/transform.py remains the test oracle."""
