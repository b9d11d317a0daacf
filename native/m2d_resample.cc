// Native polyphase resampler MAC loop.
//
// The reference's librosa.load(path, sr) resamples via native code under
// the soxr/resampy wheels; this is the framework's own equivalent. Python
// designs the kaiser-windowed sinc filter (music2dance_tpu/audio/
// resample.py, which also holds the numpy fallback with identical
// semantics); this loop evaluates the rational L-up / M-down polyphase
//
//   out[j] = sum_i  y[i] * h[j*M - i*L + half]
//
// with zero-padded edges, never materializing the zero-stuffed signal.
// Compiled into build/libm2dwav.so next to the WAV codec.

#include <cstdint>

extern "C" {

// Returns 0 on success, -1 on bad arguments.
int m2d_resample(const float* y, long n_in, long up, long down,
                 const float* h, long n_h, float* out, long n_out) {
  if (!y || !h || !out || n_in < 0 || up <= 0 || down <= 0 || n_h <= 0 ||
      (n_h % 2) == 0)
    return -1;
  const long half = n_h / 2;
  for (long j = 0; j < n_out; ++j) {
    const long t = j * down;  // output position in upsampled-domain ticks
    // contributing inputs: i in [ceil((t - half)/up), floor((t + half)/up)]
    long i_lo = (t - half) >= 0 ? (t - half + up - 1) / up
                                : -((half - t) / up);
    long i_hi = (t + half) / up;
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n_in) i_hi = n_in - 1;
    double acc = 0.0;
    const float* hp = h + (t - i_lo * up + half);
    for (long i = i_lo; i <= i_hi; ++i, hp -= up) {
      acc += (double)y[i] * (double)(*hp);
    }
    out[j] = (float)acc;
  }
  return 0;
}

}  // extern "C"
