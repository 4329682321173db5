from .convnet import (ConvBlock, ConvNet, ConvNetDouble, ConvNetDoubleLayer,
                      ConvStack, MaxPoolMiddle, ResidualBlockStack,
                      StridedConvMiddle, get_activation)
from .embedding import SinePositionalEmbedding, TokenEmbedding, sinusoidal_table
from .transformer import MultiHeadAttention, TransformerEncoder, TransformerEncoderLayer
