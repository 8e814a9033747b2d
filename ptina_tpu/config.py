'''
Unified configuration.

The reference scatters its knobs over four mechanisms (init_things pool
caps, Globals sliders, Blender render properties, edit-the-import
choices — SURVEY.md §5 "Config / flag system").  Here they are one
dataclass with the same defaults, threaded explicitly to the code that
needs each value.
'''

import dataclasses

__all__ = ['Config', 'DEFAULT']


@dataclasses.dataclass
class Config:
    # --- engine selection (reference worker.py:6-7, tree/__init__.py:5-6) ---
    engine: str = 'path'          # 'path' | 'brute' | 'mlt'
    accel: str = 'auto'           # 'auto' | 'dense' | 'blocked'
    material_model: str = 'disney'  # 'disney' | 'lambert' | 'mirror' | 'phong'

    # --- integrator (reference engine/path.py:25, mltpath.py:25-28) ---
    max_depth: int = 5
    mlt_large_step_prob: float = 0.25
    mlt_sigma: float = 0.01
    mlt_chains: int = 2 ** 18

    # --- film / rendering (reference blender.py:922-931 defaults) ---
    render_samples: int = 128
    viewport_samples: int = 32
    albedo_samples: int = 1
    start_pixel_size: int = 8
    film_passes: int = 3

    # --- capacities (reference things.py:12-19; static pad targets) ---
    max_lights: int = 64
    max_materials: int = 64
    pad_faces_to: int = 8

    # --- numerics (reference common.py:32-33, sobol.py:75) ---
    eps: float = 1e-6
    inf: float = 1e6
    sobol_skip: int = 64


DEFAULT = Config()
