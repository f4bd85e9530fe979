from dexgangrasp_tpu.engine.folding import (
    fold_generator,
    fold_evaluator,
    generator_object_context,
    evaluator_object_context,
    generator_apply_folded,
    evaluator_apply_folded,
)
from dexgangrasp_tpu.engine.pipeline import (
    GraspEngine,
    sample_and_score,
    sample_and_topk,
    sample_and_topk_multi,
)
from dexgangrasp_tpu.engine.refine import (
    refine_grasps_gradient,
    refine_grasps_sampling,
)
from dexgangrasp_tpu.engine.frame_pipeline import frame_to_grasps
