from sleepgen.eval.bands import EEG_BANDS, filter_band, firwin_bandpass
from sleepgen.eval.fid import compute_fid, frechet_distance, usleep_fid_features
from sleepgen.eval.msssim import gaussian_kernel_1d, ms_ssim_1d, ssim_1d
from sleepgen.eval.psd import (dpss_tapers, multitaper_psd, multitaper_psd_db,
                               welch_psd, welch_psd_db)

__all__ = [
    "dpss_tapers",
    "multitaper_psd",
    "multitaper_psd_db",
    "EEG_BANDS",
    "filter_band",
    "firwin_bandpass",
    "compute_fid",
    "frechet_distance",
    "usleep_fid_features",
    "gaussian_kernel_1d",
    "ms_ssim_1d",
    "ssim_1d",
    "welch_psd",
    "welch_psd_db",
]
