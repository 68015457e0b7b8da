"""Native (C++) host runtime: fast PCD IO, ingestion, depth unprojection.

The counterpart of the reference's reliance on PCL's C++ IO and the V-REP
plugin's depth bridge (SURVEY.md A1, A31) — the host-side byte-moving that
shouldn't run at Python speed when serving. Everything here has a Python
fallback; ``available()`` reports whether the compiled path is active.
"""
from tpu_joints.native.loader import (  # noqa: F401
    available,
    depth_to_cloud_native,
    get_lib,
    ingest_native,
    load_pcd_native,
)
