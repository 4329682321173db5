from .adm import MegaADM, adm_infer
from .dscrm import Discriminator, SingleWindowDisc
from .hifigan import HiFiGAN, ResBlock1, TransposedConv1d
from .megag import MegaG
from .megatts import Megatts, synthesize, vocode
from .vocos import Vocos
from .mrte import MRTE
from .plm import MegaPLM, plm_infer
from .streaming import stream_synthesize
from .vqpe import VQProsodyEncoder
from .pretrained import (adm_from_pretrained, hifigan_from_pretrained,
                         megag_from_pretrained, megatts_from_pretrained,
                         plm_from_pretrained, vocoder_from_pretrained)
