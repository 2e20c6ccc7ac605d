from .deform_attn import fused_deform_attention
