"""The NST engine: optimization in image space as one jitted lax.scan."""

from .lbfgs import LBFGSState, lbfgs_init, lbfgs_step
from .nst import NSTResult, nst, make_nst_fn
