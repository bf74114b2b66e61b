// marhost: native host-side audio decode + resample + batch assembly.
//
// TPU-native replacement for the reference's native data-path dependencies
// (torchaudio C++ load/resample, reference datasets.py:288-291): WAV decode
// (PCM16/24/32, float32), mono mixdown, gcd-reduced windowed-sinc polyphase
// resampling (same math as ops/resample.py, torchaudio-compatible:
// lowpass_filter_width=6, rolloff=0.99, Hann window), and multi-threaded
// fixed-shape batch assembly feeding the device prefetch queue.
//
// Exposed as a C ABI for ctypes (no pybind11 in the build image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int rate = 0;
};

bool read_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto read_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto read_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };

  char tag[5] = {0};
  uint32_t riff_size = 0;
  if (std::fread(tag, 1, 4, f) != 4 || std::strncmp(tag, "RIFF", 4) ||
      !read_u32(&riff_size) || std::fread(tag, 1, 4, f) != 4 ||
      std::strncmp(tag, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool got_fmt = false;
  std::vector<uint8_t> data;

  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t size = 0;
    if (!read_u32(&size)) break;
    if (!std::strncmp(tag, "fmt ", 4)) {
      uint32_t byte_rate;
      uint16_t block_align;
      read_u16(&format);
      read_u16(&channels);
      read_u32(&rate);
      read_u32(&byte_rate);
      read_u16(&block_align);
      read_u16(&bits);
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      got_fmt = true;
    } else if (!std::strncmp(tag, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) {
        std::fclose(f);
        return false;
      }
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (!got_fmt || data.empty() || channels == 0) return false;

  const size_t bytes_per = bits / 8;
  const size_t frames = data.size() / (bytes_per * channels);
  out->samples.resize(frames);
  out->rate = static_cast<int>(rate);

  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data.data() + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (format == 3 && bits == 32) {  // IEEE float
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = s / 2147483648.0;
      } else if (bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
        v = (s >> 8) / 8388608.0;
      } else if (bits == 8) {
        v = (p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out->samples[i] = static_cast<float>(acc / channels);
  }
  return true;
}

// Windowed-sinc polyphase kernel bank (torchaudio-compatible math).
struct ResampleKernel {
  std::vector<float> taps;  // (new_g, width2) row-major
  int width = 0, orig_g = 1, new_g = 1, frame_len = 0;
};

void build_kernel(int orig_freq, int new_freq, ResampleKernel* k,
                  int lowpass_filter_width = 6, double rolloff = 0.99) {
  int g = std::gcd(orig_freq, new_freq);
  k->orig_g = orig_freq / g;
  k->new_g = new_freq / g;
  double base_freq = std::min(k->orig_g, k->new_g) * rolloff;
  k->width = static_cast<int>(
      std::ceil(lowpass_filter_width * k->orig_g / base_freq));
  k->frame_len = 2 * k->width + k->orig_g;
  k->taps.assign(static_cast<size_t>(k->new_g) * k->frame_len, 0.f);
  for (int i = 0; i < k->new_g; ++i) {
    for (int j = 0; j < k->frame_len; ++j) {
      double idx = static_cast<double>(j - k->width) / k->orig_g;
      double t = (-static_cast<double>(i) / k->new_g + idx) * base_freq;
      t = std::clamp(t, -(double)lowpass_filter_width,
                     (double)lowpass_filter_width);
      double window = std::cos(t * M_PI / lowpass_filter_width / 2);
      window *= window;
      double tp = t * M_PI;
      double sinc = (t == 0.0) ? 1.0 : std::sin(tp) / tp;
      k->taps[static_cast<size_t>(i) * k->frame_len + j] =
          static_cast<float>(sinc * window * base_freq / k->orig_g);
    }
  }
}

// Kernel banks are expensive to build (transcendentals); cache per rate pair.
const ResampleKernel& cached_kernel(int orig_freq, int new_freq) {
  static std::map<std::pair<int, int>, ResampleKernel> cache;
  static std::mutex mu;
  std::lock_guard<std::mutex> lock(mu);
  auto key = std::make_pair(orig_freq, new_freq);
  auto it = cache.find(key);
  if (it == cache.end()) {
    ResampleKernel k;
    build_kernel(orig_freq, new_freq, &k);
    it = cache.emplace(key, std::move(k)).first;
  }
  return it->second;
}

void resample(const std::vector<float>& x, int orig_freq, int new_freq,
              std::vector<float>* out) {
  if (orig_freq == new_freq) {
    *out = x;
    return;
  }
  const ResampleKernel& k = cached_kernel(orig_freq, new_freq);
  const long length = static_cast<long>(x.size());
  const long target =
      (static_cast<long>(k.new_g) * length + k.orig_g - 1) / k.orig_g;
  const long num_frames = length / k.orig_g + 1;
  std::vector<float> xpad(k.width + length + k.width + k.orig_g, 0.f);
  std::copy(x.begin(), x.end(), xpad.begin() + k.width);
  out->assign(target, 0.f);
  for (long t = 0; t < num_frames; ++t) {
    const float* __restrict seg = xpad.data() + t * k.orig_g;
    for (int i = 0; i < k.new_g; ++i) {
      long oi = t * k.new_g + i;
      if (oi >= target) break;
      const float* __restrict taps =
          k.taps.data() + static_cast<size_t>(i) * k.frame_len;
      // four independent float accumulators: vectorizable + order-stable
      float a0 = 0.f, a1 = 0.f, a2 = 0.f, a3 = 0.f;
      int j = 0;
      const int lim = k.frame_len & ~3;
      for (; j < lim; j += 4) {
        a0 += seg[j] * taps[j];
        a1 += seg[j + 1] * taps[j + 1];
        a2 += seg[j + 2] * taps[j + 2];
        a3 += seg[j + 3] * taps[j + 3];
      }
      float acc = (a0 + a1) + (a2 + a3);
      for (; j < k.frame_len; ++j) acc += seg[j] * taps[j];
      (*out)[oi] = acc;
    }
  }
}

}  // namespace

extern "C" {

// Decode + mono + resample + zero-pad/truncate to target_len.
// Returns 0 on success; out must hold target_len floats.
int mar_wav_read(const char* path, float* out, long target_len,
                 int target_rate, long* decoded_len) {
  WavData wav;
  if (!read_wav(path, &wav)) return 1;
  std::vector<float> res;
  resample(wav.samples, wav.rate, target_rate, &res);
  long n = std::min<long>(res.size(), target_len);
  std::copy(res.begin(), res.begin() + n, out);
  std::fill(out + n, out + target_len, 0.f);
  if (decoded_len) *decoded_len = static_cast<long>(res.size());
  return 0;
}

// Threaded batch: decode n files into out (n, target_len) row-major.
// Returns the number of failures.
int mar_wav_batch(const char** paths, int n, float* out, long target_len,
                  int target_rate, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<int> failures(num_threads, 0);
  std::vector<std::thread> threads;
  for (int w = 0; w < num_threads; ++w) {
    threads.emplace_back([&, w]() {
      for (int i = w; i < n; i += num_threads) {
        if (mar_wav_read(paths[i], out + static_cast<long>(i) * target_len,
                         target_len, target_rate, nullptr) != 0) {
          failures[w]++;
        }
      }
    });
  }
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

// Standalone resampler for already-decoded audio.
int mar_resample(const float* in, long in_len, int orig_rate, int new_rate,
                 float* out, long out_capacity, long* out_len) {
  std::vector<float> x(in, in + in_len), y;
  resample(x, orig_rate, new_rate, &y);
  if (static_cast<long>(y.size()) > out_capacity) return 1;
  std::copy(y.begin(), y.end(), out);
  *out_len = static_cast<long>(y.size());
  return 0;
}

}  // extern "C"
