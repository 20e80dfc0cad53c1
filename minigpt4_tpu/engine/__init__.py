"""Engine: orchestrator, sampling, chat state machine."""

from .engine import EOS_SUFFIX, EOS_TOKEN_SUFFIX, SYSTEM_PROMPT, MiniGPT4Engine
from .sampling import Sampler, SamplingParams
from .sessions import ChatSession, SessionPool

__all__ = [
    "MiniGPT4Engine",
    "SessionPool",
    "ChatSession",
    "Sampler",
    "SamplingParams",
    "SYSTEM_PROMPT",
    "EOS_SUFFIX",
    "EOS_TOKEN_SUFFIX",
]
