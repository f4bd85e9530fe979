from dexgangrasp_tpu.ops.bps import (
    bps_encode,
    bps_encode_xla,
    bps_encode_pallas,
    load_basis,
    generate_basis,
)
from dexgangrasp_tpu.ops.chamfer import chamfer_distance, chamfer_distance_xla
from dexgangrasp_tpu.ops.assignment import auction_assign, auction_assign_batch
