from .vq import EuclideanCodebook, ResidualVectorQuantizer, VectorQuantization
