from .audio import load_wav, peak_normalize, save_wav
