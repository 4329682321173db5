from .vq import EuclideanCodebook, ResidualVectorQuantizer, VectorQuantization
from .weight_only import QDense, dequantize_tree, quantize_kernel, quantize_tree
