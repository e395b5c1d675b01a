from seld_tpu.features.mel import (  # noqa: F401
    amplitude_to_db,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    num_stft_frames,
)
