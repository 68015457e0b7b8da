"""Multi-part detection: {chord, stub} × views (SURVEY.md §2.1).

Every reference driver iterates two part banks — ``for k in {chord, stub}``
(``SHOT_demo.cpp:430-461``, ``FPFH_demo.cpp:436-467``, ``6Dpose.cpp:391-418``)
— and keeps the best-scoring part. Here each part is one :func:`detect` call
(identical shapes ⇒ one compiled executable, executed per part) and the
winner is chosen host-side by the same fitness ordering the reference uses.
Scene features are shared across parts via :func:`prepare_scene`.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import Cloud
from tpu_joints.modelbank.bank import ModelBank
from tpu_joints.pipelines.detect import DetectionResult


class MultiPartResult(NamedTuple):
    part: str                        # winning part name
    result: DetectionResult          # its detection result
    per_part: Dict[str, DetectionResult]


# One fused executable shared by every part (identical shapes ⇒ identical
# program): keeps all Pallas kernels in a single program per process, which
# the current TPU runtime requires for reliable re-execution. The scene
# features are recomputed per part — the price of that constraint.


def detect_parts(
    scene: Cloud,
    banks: Dict[str, ModelBank],
    cfg: DetectionConfig = DetectionConfig(),
) -> MultiPartResult:
    """Detect every part bank in the scene; return the best-fitness part.

    Part banks with identical capacities share one compiled executable.
    Acceptance stays per-part (a scene may contain any subset of parts —
    inspect ``per_part`` for all of them, as the reference prints every
    instance it finds).
    """
    if not banks:
        raise ValueError("no part banks given")
    from tpu_joints.pipelines.detect import detect_fused

    per_part = {name: detect_fused(scene, bank, cfg) for name, bank in banks.items()}

    def score(res: DetectionResult) -> float:
        f = float(res.full_fitness)
        return f if bool(res.cand_valid[np.argmin(np.asarray(res.cand_fitness))]) else 3e38

    best = min(per_part, key=lambda n: score(per_part[n]))
    return MultiPartResult(part=best, result=per_part[best], per_part=per_part)
