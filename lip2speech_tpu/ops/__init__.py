from lip2speech_tpu.ops import dsp, kmeans, masking, nn, warp  # noqa: F401
