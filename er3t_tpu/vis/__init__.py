from .plot import compare_data_2d, plot_flux_profile, quicklook_radiance  # noqa: F401
