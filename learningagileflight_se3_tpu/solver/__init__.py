from learningagileflight_se3_tpu.solver.ilqr import (
    MPCSolution,
    make_mpc_solver,
    make_batched_mpc_solver,
)
from learningagileflight_se3_tpu.solver.boxqp import boxqp
from learningagileflight_se3_tpu.solver.constrained import make_w_bounded_solver
from learningagileflight_se3_tpu.solver.costate import make_costate_extractor
