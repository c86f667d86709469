"""Production adaptive block geometry in CI (round-4 VERDICT item 5).

The CPU suite pins ``pallas_band.BANDS_MULT = 2`` process-wide
(conftest.py), so the geometry the production codec actually ships
(``BANDS_MULT = None``) never executed a kernel in committed CI before
this test.  A subprocess sidesteps both the pin (fresh import) and the
map-count/segfault constraint the pin exists for (fresh process).  See
``prod_geom_child.py`` for what is checked.
"""

import os
import subprocess
import sys
from pathlib import Path


def test_production_block_geometry_parity():
    child = Path(__file__).with_name("prod_geom_child.py")
    env = os.environ.copy()
    # one CPU device is enough; fewer virtual devices = smaller programs
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(child)],
        capture_output=True,
        text=True,
        env=env,
        timeout=2400,  # cold interpreter-mode compiles take minutes
    )
    assert r.returncode == 0, f"child failed:\n{r.stdout}\n{r.stderr}"
    assert "prod-geometry parity OK" in r.stdout
