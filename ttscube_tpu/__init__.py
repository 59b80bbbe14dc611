"""ttscube_tpu — TPU-native TTS framework with the capabilities of TTS-Cube.

See ARCHITECTURE.md for the design and SURVEY.md for the reference analysis.
"""

__version__ = "0.1.0"
