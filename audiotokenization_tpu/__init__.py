"""audiotokenization_tpu — a TPU-native neural audio tokenization framework.

Capabilities mirror hoyso48/AudioTokenization (BigCodec_SSL): BigCodec /
Conformer codec encoders+decoders, a quantizer zoo around a factorized VQ
tokenizer, GAN codec training, SSL semantic distillation, a stage-2 token LM,
corpus token extraction, and a reconstruction-eval suite — re-architected as
pure-JAX functional models, a single jitted pjit train step over a device
mesh, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
