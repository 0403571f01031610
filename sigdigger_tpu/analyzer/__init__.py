from sigdigger_tpu.analyzer.engine import Analyzer, AnalyzerState
from sigdigger_tpu.analyzer.messages import (
    ChannelMessage,
    InspectorMessage,
    InspectorMessageKind,
    Message,
    MessageKind,
    PSDMessage,
    SamplesMessage,
    SourceInfoMessage,
    StatusMessage,
)
from sigdigger_tpu.analyzer.tracker import (
    AnalyzerRequest,
    AnalyzerRequestTracker,
)

__all__ = [
    "Analyzer",
    "AnalyzerRequest",
    "AnalyzerRequestTracker",
    "AnalyzerState",
    "ChannelMessage",
    "InspectorMessage",
    "InspectorMessageKind",
    "Message",
    "MessageKind",
    "PSDMessage",
    "SamplesMessage",
    "SourceInfoMessage",
    "StatusMessage",
]
