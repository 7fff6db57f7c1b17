from jsonschema_spark.functions.audio import audio_snr, audio_snr_ok, decode_pcm_batch

__all__ = ["audio_snr", "audio_snr_ok", "decode_pcm_batch"]
