from .length_regulator import gather_indices, regulate_length
from .masks import NEG_INF, causal_mask, make_attn_mask, make_pad_mask
from .mel import (mel_filterbank, mel_spectrogram, mel_spectrogram_fused,
                  num_frames)
from .attention_pallas import flash_attention
