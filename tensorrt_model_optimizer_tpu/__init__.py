"""tensorrt_model_optimizer_tpu: TPU-native model optimization + quantized inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of NVIDIA Model
Optimizer (reference: wxsms/TensorRT-Model-Optimizer): quantization (PTQ/QAT),
calibration algorithms, real-quant compression + fused Pallas GEMMs, KV-cache
quantization, export, NAS/pruning, distillation, sparsity, speculative
decoding — designed TPU-first (SPMD meshes, functional transforms, Pallas
kernels), not a port of the reference's torch module machinery.
"""

__version__ = "0.1.0"
