// FFTW stub for building the reference demod chain without FFTW3f.
// The FFTs feed only the GUI magnitude spectra (broadcast_fm_demod.cpp:26-40,
// UpdateFFTCalc) and never touch the demodulated audio or RDS paths, so a
// zero-fill stands in when producing golden outputs for parity tests.
#include "dsp/calculate_fft.h"

void CalculateFFT(
    tcb::span<const std::complex<float>> x,
    tcb::span<std::complex<float>> y) {
    (void)x;
    for (size_t i = 0; i < y.size(); i++) y[i] = {0.0f, 0.0f};
}

void CalculateIFFT(
    tcb::span<const std::complex<float>> x,
    tcb::span<std::complex<float>> y) {
    (void)x;
    for (size_t i = 0; i < y.size(); i++) y[i] = {0.0f, 0.0f};
}
