// Native device/terminal runtime for the playback loop.
//
// The reference's native surface is Rust→C FFI: an ALSA mmap playback
// device (runtime.rs:251-394), a lock-free SPSC command ring crossing the
// REPL→audio thread boundary (commands.rs:11-69), and raw-terminal
// control with signal-safe restore (runtime.rs:396-458).  This file is
// the C++ equivalent; the compute half (the block renderer) stays JAX.
//
// ALSA is loaded with dlopen at runtime so the library builds and runs on
// audio-less TPU hosts (a null sink keeps the loop testable — the
// reference's hard `hw:0,0` coupling is what made its own tests
// unrunnable, SURVEY §4).
//
// Build: make -C audio_decoder_tpu/native  (produces libblastrt.so)

#include <dlfcn.h>
#include <errno.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <string.h>
#include <termios.h>
#include <unistd.h>

#include <atomic>

// ---------------------------------------------------------------------------
// Lock-free SPSC ring of fixed-size command strings (≙ CmdQueue,
// commands.rs:11-69: capacity-1 usable slots, acquire/release ordering).
// ---------------------------------------------------------------------------

namespace {
constexpr int kSlot = 256;

struct Ring {
  int cap;
  std::atomic<uint32_t> head;  // consumer
  std::atomic<uint32_t> tail;  // producer
  char* slots;
};
}  // namespace

extern "C" {

void* spsc_create(int capacity) {
  Ring* r = new Ring();
  r->cap = capacity;
  r->head.store(0);
  r->tail.store(0);
  r->slots = new char[(size_t)capacity * kSlot]();
  return r;
}

void spsc_destroy(void* h) {
  Ring* r = (Ring*)h;
  delete[] r->slots;
  delete r;
}

// 0 on success, -1 when full (caller reports + drops, runtime.rs:156-162).
int spsc_push(void* h, const char* cmd) {
  Ring* r = (Ring*)h;
  uint32_t tail = r->tail.load(std::memory_order_relaxed);
  uint32_t next = (tail + 1) % r->cap;
  if (next == r->head.load(std::memory_order_acquire)) return -1;
  strncpy(r->slots + (size_t)tail * kSlot, cmd, kSlot - 1);
  r->slots[(size_t)tail * kSlot + kSlot - 1] = 0;
  r->tail.store(next, std::memory_order_release);
  return 0;
}

// 0 on success (out filled, out_cap >= 256), -1 when empty.
int spsc_pop(void* h, char* out) {
  Ring* r = (Ring*)h;
  uint32_t head = r->head.load(std::memory_order_relaxed);
  if (head == r->tail.load(std::memory_order_acquire)) return -1;
  memcpy(out, r->slots + (size_t)head * kSlot, kSlot);
  r->head.store((head + 1) % r->cap, std::memory_order_release);
  return 0;
}

// ---------------------------------------------------------------------------
// Raw terminal control (≙ raw_mode/read_char, runtime.rs:431-458)
// ---------------------------------------------------------------------------

static struct termios g_orig_term;
static std::atomic<int> g_term_saved(0);

int term_raw_on(void) {
  if (!isatty(STDIN_FILENO)) return -1;
  if (tcgetattr(STDIN_FILENO, &g_orig_term) != 0) return -1;
  g_term_saved.store(1);
  struct termios raw = g_orig_term;
  cfmakeraw(&raw);
  raw.c_oflag |= OPOST;  // keep \n → \r\n on output for sane prints
  return tcsetattr(STDIN_FILENO, TCSANOW, &raw);
}

int term_raw_off(void) {
  if (!g_term_saved.load()) return -1;
  return tcsetattr(STDIN_FILENO, TCSANOW, &g_orig_term);
}

// Blocking single-byte read; returns -1 on EOF/error.
int term_read_char(void) {
  unsigned char c;
  ssize_t n = read(STDIN_FILENO, &c, 1);
  return n == 1 ? (int)c : -1;
}

// ---------------------------------------------------------------------------
// Playback sink: ALSA when libasound is present, else null (timed drop).
// snd_pcm_writei-based (robust, still period-paced); xrun recovery via
// snd_pcm_recover mirrors runtime.rs:331-346.
// ---------------------------------------------------------------------------

typedef struct {
  void* dl;
  void* pcm;
  int rate, channels;
  int is_null;
  // resolved symbols
  int (*open_)(void**, const char*, int, int);
  int (*set_params)(void*, int, int, unsigned, unsigned, int, unsigned);
  long (*writei)(void*, const void*, unsigned long);
  int (*recover)(void*, int, int);
  int (*close_)(void*);
  const char* (*strerror_)(int);
} Sink;

extern "C" void* sink_open(const char* device, int rate, int channels) {
  Sink* s = new Sink();
  memset(s, 0, sizeof(*s));
  s->rate = rate;
  s->channels = channels;
  s->dl = dlopen("libasound.so.2", RTLD_NOW);
  if (!s->dl) {
    s->is_null = 1;
    return s;
  }
  s->open_ = (int (*)(void**, const char*, int, int))dlsym(s->dl, "snd_pcm_open");
  s->set_params = (int (*)(void*, int, int, unsigned, unsigned, int, unsigned))
      dlsym(s->dl, "snd_pcm_set_params");
  s->writei = (long (*)(void*, const void*, unsigned long))
      dlsym(s->dl, "snd_pcm_writei");
  s->recover = (int (*)(void*, int, int))dlsym(s->dl, "snd_pcm_recover");
  s->close_ = (int (*)(void*))dlsym(s->dl, "snd_pcm_close");
  if (!s->open_ || !s->set_params || !s->writei || !s->recover || !s->close_) {
    s->is_null = 1;
    return s;
  }
  // SND_PCM_STREAM_PLAYBACK = 0, blocking mode
  if (s->open_(&s->pcm, device, 0, 0) < 0) {
    s->is_null = 1;
    return s;
  }
  // format SND_PCM_FORMAT_S16_LE = 2, access RW_INTERLEAVED = 3,
  // latency ~ 4 x 128-frame periods (runtime.rs:282-291's geometry)
  unsigned latency_us = (unsigned)(512.0 * 1e6 / rate);
  if (s->set_params(s->pcm, 2, 3, (unsigned)channels, (unsigned)rate, 1,
                    latency_us) < 0) {
    s->close_(s->pcm);
    s->is_null = 1;
  }
  return s;
}

extern "C" int sink_is_null(void* h) { return ((Sink*)h)->is_null; }

// Write interleaved S16 frames; paces a null sink by sleeping the block's
// real-time duration so the loop behaves like a device.
extern "C" int sink_write(void* h, const int16_t* frames, int n_frames) {
  Sink* s = (Sink*)h;
  if (s->is_null) {
    usleep((useconds_t)((double)n_frames * 1e6 / s->rate));
    return n_frames;
  }
  long written = 0;
  int zero_writes = 0;
  const int16_t* p = frames;
  while (written < n_frames) {
    long rc = s->writei(s->pcm, p, (unsigned long)(n_frames - written));
    if (rc < 0) {
      rc = s->recover(s->pcm, (int)rc, 1);  // xrun recovery
      if (rc < 0) return (int)rc;
      continue;
    }
    if (rc == 0) {
      // ALSA can report 0 frames accepted (e.g. draining/odd states);
      // back off briefly and bail after ~1 s instead of spinning the
      // render thread forever
      if (++zero_writes > 1000) return -EIO;
      usleep(1000);
      continue;
    }
    zero_writes = 0;
    written += rc;
    p += rc * s->channels;
  }
  return (int)written;
}

extern "C" void sink_close(void* h) {
  Sink* s = (Sink*)h;
  if (!s->is_null && s->pcm) s->close_(s->pcm);
  if (s->dl) dlclose(s->dl);
  delete s;
}

}  // extern "C"
