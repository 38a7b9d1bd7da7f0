from .attention import fused_attention, reference_attention
from .preprocess import gather_normalize_pallas, gather_normalize_xla
