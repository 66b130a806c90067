"""PDAE-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
representation learning from pre-trained diffusion models.

Re-designed from scratch with the capabilities of ckczzj/PDAE
(NeurIPS 2022), built TPU-first: lax.scan denoising loops compiled to
single XLA programs, data-parallel training over a jax.sharding.Mesh,
bf16 MXU compute, and Pallas kernels on the hot attention path.
"""

__version__ = "0.1.0"
