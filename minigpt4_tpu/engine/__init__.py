"""Engine: orchestrator, sampling, chat state machine."""

from .engine import EOS_SUFFIX, EOS_TOKEN_SUFFIX, SYSTEM_PROMPT, MiniGPT4Engine
from .sampling import Sampler, SamplingParams

__all__ = [
    "MiniGPT4Engine",
    "Sampler",
    "SamplingParams",
    "SYSTEM_PROMPT",
    "EOS_SUFFIX",
    "EOS_TOKEN_SUFFIX",
]
