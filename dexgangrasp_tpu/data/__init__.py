from dexgangrasp_tpu.data.grasp_store import GraspDataHandler, InMemoryGraspStore
from dexgangrasp_tpu.data.datasets import (
    DexGeneratorDataSet,
    DexEvaluatorDataSet,
)
from dexgangrasp_tpu.data.loader import BatchLoader
from dexgangrasp_tpu.data.synthetic import build_synthetic_dataset
