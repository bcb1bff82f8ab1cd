"""Command-line interface: ``python -m small_pathtracer_tpu.cli``.

The reference has no flags at all — resolution/spp are compile-time
constants (/root/reference/src/smallpt.cpp:507-508), the scene is a global
array (:287-311), and estimators are chosen by (un)commenting code
(:339-360, :464). Every one of those knobs is a flag here (SURVEY.md
section 5, "Config / flag system").
"""

from .main import main

__all__ = ["main"]
