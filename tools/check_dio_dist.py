"""Distribution of TPU dio+stonemask F0 error vs the f64 golden."""
import numpy as np
from scipy.io import wavfile


def main():
    from world_tpu import World

    fs, x = wavfile.read("/root/reference/test/test-mwm.wav")
    x = (x / (2 ** 15 - 1)).astype(np.float32)
    w = World()
    dat = w.encode(int(fs), x, f0_method="dio", is_requiem=False)
    g = np.load("/root/repo/tests/golden/stonemask.npz")
    f0 = np.asarray(dat["f0"])[: len(g["refined_f0"])]
    gd = g["refined_f0"][: len(f0)]
    both = (f0 > 0) & (gd > 0)
    d = np.abs(f0[both] - gd[both])
    print("voiced frames", int(both.sum()))
    for p in (50, 90, 99, 100):
        print(f"p{p}: {np.percentile(d, p):.4f} Hz")
    print("frames >1Hz:", int((d > 1).sum()), " >5Hz:", int((d > 5).sum()))
    # where are the big ones?
    idx = np.where(both)[0][np.argsort(d)[-5:]]
    for i in idx:
        print(f"frame {i}: tpu {f0[i]:.3f} golden {gd[i]:.3f}")


if __name__ == "__main__":
    main()
