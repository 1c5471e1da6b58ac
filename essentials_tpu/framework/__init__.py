"""Problem/Enactor framework: the bulk-synchronous superstep driver.

Reference parity: include/gunrock/framework/{problem.hxx, enactor.hxx}. The
reference's virtual-method enactor drives a host `while (!converged)` loop
with per-iteration device syncs (enactor.hxx:243-296); here the whole loop is
ONE compiled XLA program: `jax.lax.while_loop` with an on-device convergence
predicate — zero host round-trips inside the hot loop.
"""

from essentials_tpu.framework.enactor import enact, EnactResult, default_converged
from essentials_tpu.framework.problem import Problem

__all__ = ["enact", "EnactResult", "default_converged", "Problem"]
