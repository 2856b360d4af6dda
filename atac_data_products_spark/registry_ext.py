"""Extension registry: dedup / similarity / text / multimodal / streaming.

Registered into the same QUERIES/ORACLES dicts as the core registry
(import side effect).  Implementations land incrementally; this module
grows per milestone.
"""

from __future__ import annotations
