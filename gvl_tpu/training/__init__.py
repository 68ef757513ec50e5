"""Training: projector alignment + LoRA SFT, data-parallel over the mesh."""

from gvl_tpu.training.projector_train import (
    MultimodalProjectorDataset,
    ProjectorTrainer,
    evaluate_retrieval,
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
    "evaluate_retrieval",
    "LoraTrainingConfig",
    "LoraTrainer",
    "load_chat_training_data",
]
