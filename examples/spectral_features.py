"""Feature-codec demo with LSD quality metrics.

Mirrors the reference's test/spectralFeatures.py:1-51: encode a wav, extract
log-filterbank and MCEP features, reconstruct the spectrum from MCEP, and
report log-spectral distortion.
"""
import numpy as np


def lsd(A, B):
    return np.mean(np.sqrt(np.mean((20 * np.log10(A / B)) ** 2, axis=1)))


def main():
    from world_tpu import World
    from world_tpu.io.wav import read_wav

    fs, x = read_wav("/root/reference/test/test-mwm.wav")
    vocoder = World()
    dat = vocoder.encode(fs, x, f0_method="harvest")
    spec = np.sqrt(np.asarray(dat["spectrogram"]).T)  # (frames, bins) magnitude

    lf = vocoder.encode_lfbank(spec, fs=fs)
    print(f"log-filterbank: {lf.shape}")

    mcep = vocoder.encode_mcep(spec, n0=40, fs=fs, highhz=fs / 2)
    rec = vocoder.decode_mcep(mcep, (spec.shape[1] - 1) * 2)
    print(f"MCEP-40 round-trip LSD: {lsd(spec, rec):.2f} dB")
    # (the reference records 5.23 dB for its 16 kHz configuration,
    #  test/spectralFeatures.py:34)


if __name__ == "__main__":
    main()
