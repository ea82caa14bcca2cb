"""Public model API.

Mirrors the reference's `from vq import BigCodecEncoder, BigCodecDecoder,
ConformerEncoderSTFT, ConformerDecoderISTFT` / `from module import ...`
surface (BigCodec_SSL/vq/__init__.py, module/__init__.py) in functional form.
"""
from .bigcodec import (bigcodec_decode, bigcodec_encode,  # noqa: F401
                       init_bigcodec_decoder, init_bigcodec_encoder)
from .codec import (CodecOutput, codes_to_emb, decode, encode, forward,  # noqa: F401
                    init_codec, quantize, tokenize)
from .conformer import (conformer_decode, conformer_encode,  # noqa: F401
                        init_conformer_decoder, init_conformer_encoder)
from .discriminators import (init_mpd, init_spec_discriminator,  # noqa: F401
                             mpd_apply, spec_discriminator_apply)
