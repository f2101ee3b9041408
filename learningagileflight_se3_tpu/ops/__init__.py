from learningagileflight_se3_tpu.ops.riccati_pallas import (
    riccati_backward_pallas,
    riccati_backward_reference,
)
