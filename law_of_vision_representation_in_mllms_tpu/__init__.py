"""TPU-native framework for the *Law of Vision Representation in MLLMs*.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
`bronyayang/Law_of_Vision_Representation_in_MLLMs`:

- a 13-representation vision-tower zoo (CLIP / OpenCLIP / SigLIP / DINOv2 ViTs
  plus SD-1.5 / SD-2.1 / SDXL / SD-image-variations / DiT / SD3
  diffusion-feature extractors and dot-concatenated pairs),
- the LLaVA-1.5 architecture (tower(s) -> feature concat -> mm_projector ->
  image-token splice -> LLaMA decoder) with stage-1 / stage-2 training,
- an lmms-eval-compatible benchmark harness with first-class embedding dumps,
- the A score (cross-modal max-cosine alignment) and C score (SPair-71k PCK
  dense correspondence) as on-device metric kernels,
- the AC policy (degree-2 polynomial regression for optimal-representation
  prediction).

Everything on the compute path is functional JAX under `jit`, sharded over a
`jax.sharding.Mesh` via GSPMD; hot kernels are Pallas.

Typical import alias::

    import law_of_vision_representation_in_mllms_tpu as lvr
"""

__version__ = "0.1.0"
