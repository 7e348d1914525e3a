"""Host-side data layer: datasets, samplers, the prefetching Loader, and
host image/text preprocessing.

Device-side preprocessing (STFT, SpecAugment) lives in ``ops/``; this
package only does what must happen on the host — file IO, JPEG decode,
tokenization, index sampling — and hands fixed-shape numpy batches to the
jitted step functions (the TPU-native split of the reference's torch
DataLoader worker pipeline, e.g. cremad/run_trainer.py:41-49).
"""
