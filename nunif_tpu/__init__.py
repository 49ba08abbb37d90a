"""nunif_tpu — a TPU-native (JAX / XLA / Pallas / pjit) image & video restoration framework.

Ground-up TPU-first re-design of the capabilities of nagadomi/nunif:
a reusable model/training/inference framework plus the applications built on it
(waifu2x super-resolution, iw3 2D->3D conversion, stlizer stabilization, cliqa
quality scoring).  See SURVEY.md at the repo root for the reference analysis.
"""

__version__ = "0.1.0"
