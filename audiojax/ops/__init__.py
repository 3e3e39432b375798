from . import stft_pallas
from .stft_pallas import fast_stft_packed, pallas_supported, stft_packed_pallas
