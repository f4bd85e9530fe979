from dexgangrasp_tpu.models.layers import (
    linear_init,
    linear_apply,
    batchnorm_init,
    batchnorm_apply,
    resblock_init,
    resblock_apply,
    leaky_relu,
)
from dexgangrasp_tpu.models.networks import (
    DexGenerator,
    DexDiscriminator,
    DexEvaluator,
    GeneratorOutput,
    init_dexgan,
    init_evaluator,
)
