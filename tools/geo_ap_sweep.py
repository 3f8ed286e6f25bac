#!/usr/bin/env python
"""CPU AP sweep over the hier-geodesic approximation knobs.

Prices coarse-graph cost levers on the walled two-instance scene
(tests/test_geodesic_ap_delta.py): cell_factor (coarse cell size),
kc (coarse edge fan-out), coarse_eps (fixpoint exit slack). AP50 either
holds at 1.0 or collapses to 0.5 on this scene (one instance lost), so it
gates which on-chip A/B winners are ALLOWED to ship.

Run on CPU (exact eval): python tools/geo_ap_sweep.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")

from test_geodesic_ap_delta import _ap_for_solver  # noqa: E402


def main():
    grid = [
        # (label, kwargs)
        ("shipped (cf=2.0, kc=32, eps=0)", dict()),
        ("cell_factor=3.0", dict(cell_factor=3.0)),
        ("cell_factor=4.0", dict(cell_factor=4.0)),
        ("kc=16", dict(kc=16)),
        ("kc=8", dict(kc=8)),
        ("coarse_eps=2mm", dict(coarse_eps=0.002)),
        ("coarse_eps=1cm", dict(coarse_eps=0.01)),
        ("cf=3 + kc=16 + eps=2mm", dict(cell_factor=3.0, kc=16,
                                        coarse_eps=0.002)),
    ]
    for label, kw in grid:
        ap50, ap25 = _ap_for_solver(True, fine_k=16, fine_sweeps=4, **kw)
        print(f"{label:32s} AP50={ap50:.2f} AP25={ap25:.2f}", flush=True)


if __name__ == "__main__":
    main()
