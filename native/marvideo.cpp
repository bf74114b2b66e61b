// marvideo: native host-side mp4/video decode + resize + batch assembly.
//
// TPU-native replacement for the reference's video decode dependencies
// (cv2.VideoCapture in reference prepare_numpy_data.py:15-35, FFmpeg via
// torchvision.io.read_video in reference make_pt_video.py:17): demux +
// decode through libavformat/libavcodec, YUV->RGB24 conversion and optional
// bilinear resize fused into one swscale pass per frame, and multi-threaded
// fixed-shape batch assembly feeding the device prefetch queue (SURVEY
// §2.10 host-decode service).  cv2 decodes the same streams through the
// same FFmpeg codecs, so frames are bit-identical to the Python fallback
// path up to swscale's colorspace rounding.
//
// Exposed as a C ABI for ctypes (no pybind11 in the build image); built as
// a separate libmarvideo.so so libmarhost.so stays dependency-free.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream = -1;

  ~Decoder() {
    if (sws) sws_freeContext(sws);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    const AVCodec* dec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream < 0 || !dec) return false;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return false;
    if (avcodec_parameters_to_context(codec, fmt->streams[stream]->codecpar) < 0)
      return false;
    codec->thread_count = 1;  // parallelism comes from the batch threads
    return avcodec_open2(codec, dec, nullptr) >= 0;
  }
};

// Convert one decoded frame to RGB24 at (out_w, out_h) into dst.
bool emit_frame(Decoder& d, AVFrame* f, uint8_t* dst, int out_w, int out_h) {
  d.sws = sws_getCachedContext(
      d.sws, f->width, f->height, static_cast<AVPixelFormat>(f->format),
      out_w, out_h, AV_PIX_FMT_RGB24,
      (f->width == out_w && f->height == out_h) ? SWS_POINT : SWS_BILINEAR,
      nullptr, nullptr, nullptr);
  if (!d.sws) return false;
  uint8_t* planes[4] = {dst, nullptr, nullptr, nullptr};
  int strides[4] = {out_w * 3, 0, 0, 0};
  sws_scale(d.sws, f->data, f->linesize, 0, f->height, planes, strides);
  return true;
}

// Decode up to max_frames RGB24 frames at (out_w, out_h); returns the frame
// count or -1.  out must hold max_frames * out_h * out_w * 3 bytes.
long decode_video(const char* path, uint8_t* out, long max_frames,
                  int out_w, int out_h) {
  Decoder d;
  if (!d.open(path)) return -1;
  if (out_w <= 0 || out_h <= 0) {
    out_w = d.codec->width;
    out_h = d.codec->height;
  }
  d.pkt = av_packet_alloc();
  d.frame = av_frame_alloc();
  const long frame_bytes = static_cast<long>(out_h) * out_w * 3;
  long n = 0;
  bool failed = false;  // conversion failure, distinct from hitting max

  auto drain = [&]() -> bool {  // false = stop (error or max reached)
    while (avcodec_receive_frame(d.codec, d.frame) == 0) {
      if (n >= max_frames) {
        av_frame_unref(d.frame);
        return false;
      }
      bool ok = emit_frame(d, d.frame, out + n * frame_bytes, out_w, out_h);
      av_frame_unref(d.frame);
      if (!ok) {
        failed = true;
        return false;
      }
      ++n;
    }
    return true;
  };

  bool more = true;
  while (more && av_read_frame(d.fmt, d.pkt) >= 0) {
    if (d.pkt->stream_index == d.stream &&
        avcodec_send_packet(d.codec, d.pkt) == 0) {
      more = drain();
    }
    av_packet_unref(d.pkt);
  }
  if (more && avcodec_send_packet(d.codec, nullptr) == 0) drain();  // flush
  return failed ? -1 : n;
}

}  // namespace

extern "C" {

// Stream geometry without decoding.  nb_frames is the container's count
// (0 when the muxer didn't record one).  Returns 0 on success.
int mar_video_probe(const char* path, int* width, int* height,
                    long* nb_frames, double* fps) {
  Decoder d;
  if (!d.open(path)) return 1;
  if (width) *width = d.codec->width;
  if (height) *height = d.codec->height;
  AVStream* st = d.fmt->streams[d.stream];
  if (nb_frames) *nb_frames = static_cast<long>(st->nb_frames);
  if (fps) {
    AVRational r = st->avg_frame_rate;
    *fps = r.den ? static_cast<double>(r.num) / r.den : 0.0;
  }
  return 0;
}

// Decode up to max_frames frames as RGB24 (T, out_h, out_w, 3) uint8; a
// non-positive out_w/out_h decodes at native resolution (probe first to
// size the buffer).  Returns frames decoded, or -1 on demux/decode error.
long mar_video_read(const char* path, unsigned char* out, long max_frames,
                    int out_w, int out_h) {
  return decode_video(path, out, max_frames, out_w, out_h);
}

// Threaded fixed-shape batch: out (n, frames, out_h, out_w, 3) uint8,
// zero-padded past each clip's end (the reference's AppendVideoZeroFrames,
// datasets.py:183-200, applied at decode time).  Returns failure count.
int mar_video_batch(const char** paths, int n, unsigned char* out,
                    long frames, int out_w, int out_h, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const long clip_bytes = frames * static_cast<long>(out_h) * out_w * 3;
  std::vector<int> failures(num_threads, 0);
  std::vector<std::thread> threads;
  for (int w = 0; w < num_threads; ++w) {
    threads.emplace_back([&, w]() {
      for (int i = w; i < n; i += num_threads) {
        uint8_t* dst = out + static_cast<long>(i) * clip_bytes;
        long got = decode_video(paths[i], dst, frames, out_w, out_h);
        if (got < 0) {
          failures[w]++;
          got = 0;
        }
        std::memset(dst + got * static_cast<long>(out_h) * out_w * 3, 0,
                    (frames - got) * static_cast<long>(out_h) * out_w * 3);
      }
    });
  }
  for (auto& t : threads) t.join();
  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
