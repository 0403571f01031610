from sigdigger_tpu.tasks.base import (
    CancellableTask,
    MultitaskController,
    TaskController,
    TaskProgress,
)
from sigdigger_tpu.tasks.carrier import CarrierDetector, CarrierXlator
from sigdigger_tpu.tasks.doppler import DopplerCalculator, DopplerResult
from sigdigger_tpu.tasks.export import ExportCSVTask, ExportSamplesTask
from sigdigger_tpu.tasks.sampler import (
    SamplingProperties,
    SyncMode,
    WaveSampler,
    WaveSampleSet,
)
from sigdigger_tpu.tasks.transforms import (
    AGCTask,
    CostasRecoveryTask,
    DelayedConjTask,
    HistogramFeeder,
    LPFTask,
    PLLSyncTask,
    QuadDemodTask,
)

__all__ = [
    "AGCTask",
    "CancellableTask",
    "CarrierDetector",
    "CarrierXlator",
    "CostasRecoveryTask",
    "DelayedConjTask",
    "DopplerCalculator",
    "DopplerResult",
    "ExportCSVTask",
    "ExportSamplesTask",
    "HistogramFeeder",
    "LPFTask",
    "MultitaskController",
    "PLLSyncTask",
    "QuadDemodTask",
    "SamplingProperties",
    "SyncMode",
    "TaskController",
    "TaskProgress",
    "WaveSampleSet",
    "WaveSampler",
]
