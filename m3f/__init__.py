"""m3f — TPU-native rebuild of the m3f.pytorch multi-modal valence-arousal framework."""
