"""Training: stage-1 projection fine-tuning (the trainer the reference lacks)."""

from .projection import caption_loss, make_train_step

__all__ = ["caption_loss", "make_train_step"]
