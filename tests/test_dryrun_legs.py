"""Fast-suite twins of the driver's multichip dryrun legs.

Round 4 proved the suite and the driver artifact can decouple: every SP
trainer test was slow-marked and pinned to the one config shape that
happened to compile, so ``pytest -m "not slow"`` stayed green while
``__graft_entry__.dryrun_multichip(8)`` CHECK-crashed XLA:CPU
(MULTICHIP_r04.json rc=-6). This module runs EXACTLY the dryrun legs —
same code, via ``__graft_entry__.run_dryrun_legs`` — so any config that
breaks the driver's contract breaks CI first. Deliberately NOT slow-marked.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_dryrun_legs_exact_configs():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g

    g.run_dryrun_legs(8)
