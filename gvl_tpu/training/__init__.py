"""Training: projector alignment + LoRA SFT, data-parallel over the mesh."""

from gvl_tpu.training.projector_train import (
    MultimodalProjectorDataset,
    ProjectorTrainer,
    ProjectorTrainingConfig,
)
from gvl_tpu.training.lora_train import (
    LoraTrainer,
    LoraTrainingConfig,
    load_chat_training_data,
)

__all__ = [
    "ProjectorTrainingConfig",
    "MultimodalProjectorDataset",
    "ProjectorTrainer",
    "LoraTrainingConfig",
    "LoraTrainer",
    "load_chat_training_data",
]
