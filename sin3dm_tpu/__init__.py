"""sin3dm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for learning a
diffusion model from a single textured 3D shape.

Re-implements the full capability surface of the Sin3DM reference
(preprocess -> triplane autoencoder -> triplane DDPM -> sample -> mesh decode
-> evaluation) with an architecture designed for TPU hardware:

* the native data type is a :class:`~sin3dm_tpu.core.triplane.Triplane`
  pytree of three channels-last feature planes (the reference's composed
  2D map, `src/utils/triplane_util.py:7-25`, exists only at file/IO
  boundaries),
* models are functional (param pytrees + pure apply functions) and compile
  under `jax.jit`,
* samplers are `lax.scan` loops — one XLA program for a full DDPM chain,
* parallelism is expressed with `jax.sharding.Mesh` + `NamedSharding`
  (data-parallel diffusion batch, sharded point batches for the
  autoencoder and dense grid decode),
* geometry (marching cubes, SDF queries, decimation, UV atlas, rasterizer)
  is a first-party C++ extension with ctypes bindings.
"""

__version__ = "0.1.0"
