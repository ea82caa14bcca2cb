from .gan import disc_loss, gen_adv_loss, feature_matching_loss  # noqa: F401
from .mel import MultiResolutionMelLoss  # noqa: F401
from .stft_loss import multi_resolution_stft_loss  # noqa: F401
