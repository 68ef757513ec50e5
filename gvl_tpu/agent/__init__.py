"""Agent core: conversation, retrieval, tools, triggers, prompts, reasoning.

The host-side orchestration around the TPU reasoning model.  Everything in
this package is accelerator-free except the reasoning core itself
(:mod:`gvl_tpu.agent.core`), which drives the Qwen3-class JAX model.
"""

from gvl_tpu.agent.config import ReasoningCoreConfig
from gvl_tpu.agent.conversation import ConversationHistory, ConversationTurn
from gvl_tpu.agent.confidence import ConfidenceScorer
from gvl_tpu.agent.special_tokens import SpecialTokens
from gvl_tpu.agent.tools import ToolCall, ToolCallParser
from gvl_tpu.agent.trigger import TriggerDetector, TriggerEvent
from gvl_tpu.agent.temporal_context import TemporalContextManager
from gvl_tpu.agent.retriever import HashingTextEmbedder, TimelineRetriever
from gvl_tpu.agent.core import (
    ReasoningCore,
    TemplateFakeBackend,
    TimelineGroundedFakeBackend,
    VisualInputProcessor,
    create_reasoning_core,
)
from gvl_tpu.agent.loop import PerceptionReasoningLoop, create_perception_loop
from gvl_tpu.agent.search import (
    GameDetector,
    GameKnowledgeSearcher,
    SearchCache,
    create_search_enhanced_system_prompt,
)

__all__ = [
    "ReasoningCoreConfig",
    "ConversationTurn",
    "ConversationHistory",
    "ConfidenceScorer",
    "SpecialTokens",
    "ToolCall",
    "ToolCallParser",
    "TriggerEvent",
    "TriggerDetector",
    "TemporalContextManager",
    "HashingTextEmbedder",
    "TimelineRetriever",
    "ReasoningCore",
    "TemplateFakeBackend",
    "TimelineGroundedFakeBackend",
    "VisualInputProcessor",
    "create_reasoning_core",
    "PerceptionReasoningLoop",
    "create_perception_loop",
    "GameKnowledgeSearcher",
    "GameDetector",
    "SearchCache",
    "create_search_enhanced_system_prompt",
]
