"""Model definitions: EVA-CLIP ViT-G, BLIP-2 Q-Former, LLaMA/Vicuna decoder,
and the combined MiniGPT-4 vision pipeline."""

from . import eva_vit, llama, minigpt4, qformer
from .params import QTensor, linear

__all__ = ["eva_vit", "llama", "minigpt4", "qformer", "QTensor", "linear"]
