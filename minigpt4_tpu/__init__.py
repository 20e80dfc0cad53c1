"""minigpt4_tpu — a TPU-native (JAX/XLA/Pallas) multimodal inference framework
with the capabilities of minigpt4.cpp.

Pipeline: image -> EVA-CLIP ViT-G -> BLIP-2 Q-Former -> linear projection ->
Vicuna/LLaMA decoder, loading the reference's ggml container + llama.cpp
checkpoint files unmodified.
"""

__version__ = "0.1.0"
