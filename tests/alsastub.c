// alsastub — a scriptable fake libasound for sink tests.
//
// Implements exactly the snd_pcm_* symbols the native sink resolves
// (audio_decoder_tpu/native/runtime.cc), with injectable fault behavior
// and full capture, so the xrun-recovery, zero-write backoff, and
// mmap-geometry paths run under test without audio hardware.  Loaded by
// pointing BLAST_ALSA_LIB at this library before sink_open.

#include <errno.h>
#include <stdint.h>
#include <string.h>

#define STUB_RING_FRAMES 512
#define STUB_MAX_CH 2
#define STUB_CAPTURE_MAX (1 << 20)

// ---- scriptable state (poked via ctypes from the test) ----
int stub_inject_epipe_writes = 0;  // next N writei calls fail with -EPIPE
int stub_inject_zero_writes = 0;   // next N writei calls accept 0 frames
int stub_inject_epipe_avail = 0;   // next N avail_update calls -EPIPE
int stub_fail_mmap_syms = 0;       // unused at runtime (symbol selection)
// ---- observability ----
int stub_recover_calls = 0;
int stub_prepare_calls = 0;
int stub_start_calls = 0;
long stub_hw_period = -1, stub_hw_buffer = -1;
int stub_hw_access = -1, stub_hw_format = -1, stub_hw_channels = -1;
int stub_hw_rate = -1;
unsigned long stub_sw_stop = 0, stub_sw_start = 0, stub_sw_avail = 0;
unsigned long stub_boundary_value = 0x4000000000000000UL;

static int16_t g_capture[STUB_CAPTURE_MAX];
static long g_captured = 0;  // samples (not frames)
static int g_channels = 2;
static int g_running = 0;
static int16_t g_ring[STUB_RING_FRAMES * STUB_MAX_CH];
static unsigned long g_pos = 0;  // ring write cursor (frames, mod ring)

long stub_captured_samples(void) { return g_captured; }
void stub_read_capture(int16_t* out, long max) {
  long n = g_captured < max ? g_captured : max;
  memcpy(out, g_capture, (size_t)n * sizeof(int16_t));
}
void stub_reset(void) {
  g_captured = 0;
  g_running = 0;
  g_pos = 0;
  stub_recover_calls = stub_prepare_calls = stub_start_calls = 0;
  stub_inject_epipe_writes = stub_inject_zero_writes = 0;
  stub_inject_epipe_avail = 0;
}

static void capture(const int16_t* p, long frames) {
  long samples = frames * g_channels;
  if (g_captured + samples > STUB_CAPTURE_MAX)
    samples = STUB_CAPTURE_MAX - g_captured;
  memcpy(g_capture + g_captured, p, (size_t)samples * sizeof(int16_t));
  g_captured += samples;
}

// ---- snd_pcm_* fakes ----
typedef struct {
  void* addr;
  unsigned int first;
  unsigned int step;
} area_t;

int snd_pcm_open(void** pcm, const char* name, int stream, int mode) {
  (void)name; (void)stream; (void)mode;
  static int dummy;
  *pcm = &dummy;
  return 0;
}
int snd_pcm_close(void* pcm) { (void)pcm; return 0; }

int snd_pcm_set_params(void* pcm, int fmt, int access, unsigned ch,
                       unsigned rate, int resample, unsigned latency) {
  (void)pcm; (void)resample; (void)latency;
  stub_hw_format = fmt;
  stub_hw_access = access;
  stub_hw_channels = (int)ch;
  stub_hw_rate = (int)rate;
  g_channels = (int)ch;
  return 0;
}

long snd_pcm_writei(void* pcm, const void* buf, unsigned long frames) {
  (void)pcm;
  if (stub_inject_epipe_writes > 0) {
    stub_inject_epipe_writes--;
    return -EPIPE;
  }
  if (stub_inject_zero_writes > 0) {
    stub_inject_zero_writes--;
    return 0;
  }
  capture((const int16_t*)buf, (long)frames);
  return (long)frames;
}

int snd_pcm_recover(void* pcm, int err, int silent) {
  (void)pcm; (void)silent;
  stub_recover_calls++;
  return (err == -EPIPE || err == -ESTRPIPE) ? 0 : err;
}

// hw/sw params: opaque blobs the caller allocates by sizeof
unsigned long snd_pcm_hw_params_sizeof(void) { return 512; }
int snd_pcm_hw_params_any(void* pcm, void* p) { (void)pcm; (void)p; return 0; }
int snd_pcm_hw_params_set_access(void* pcm, void* p, int a) {
  (void)pcm; (void)p; stub_hw_access = a; return 0;
}
int snd_pcm_hw_params_set_format(void* pcm, void* p, int f) {
  (void)pcm; (void)p; stub_hw_format = f; return 0;
}
int snd_pcm_hw_params_set_channels(void* pcm, void* p, unsigned c) {
  (void)pcm; (void)p; stub_hw_channels = (int)c; g_channels = (int)c; return 0;
}
int snd_pcm_hw_params_set_rate(void* pcm, void* p, unsigned r, int dir) {
  (void)pcm; (void)p; (void)dir; stub_hw_rate = (int)r; return 0;
}
int snd_pcm_hw_params_set_period_size(void* pcm, void* p, unsigned long n,
                                      int dir) {
  (void)pcm; (void)p; (void)dir; stub_hw_period = (long)n; return 0;
}
int snd_pcm_hw_params_set_buffer_size(void* pcm, void* p, unsigned long n) {
  (void)pcm; (void)p; stub_hw_buffer = (long)n;
  return n <= STUB_RING_FRAMES ? 0 : -EINVAL;
}
int snd_pcm_hw_params(void* pcm, void* p) { (void)pcm; (void)p; return 0; }

unsigned long snd_pcm_sw_params_sizeof(void) { return 512; }
int snd_pcm_sw_params_current(void* pcm, void* p) {
  (void)pcm; (void)p; return 0;
}
int snd_pcm_sw_params_get_boundary(void* p, unsigned long* b) {
  (void)p; *b = stub_boundary_value; return 0;
}
int snd_pcm_sw_params_set_stop_threshold(void* pcm, void* p,
                                         unsigned long v) {
  (void)pcm; (void)p; stub_sw_stop = v; return 0;
}
int snd_pcm_sw_params_set_start_threshold(void* pcm, void* p,
                                          unsigned long v) {
  (void)pcm; (void)p; stub_sw_start = v; return 0;
}
int snd_pcm_sw_params_set_avail_min(void* pcm, void* p, unsigned long v) {
  (void)pcm; (void)p; stub_sw_avail = v; return 0;
}
int snd_pcm_sw_params(void* pcm, void* p) { (void)pcm; (void)p; return 0; }

int snd_pcm_prepare(void* pcm) {
  (void)pcm; stub_prepare_calls++; g_running = 0; return 0;
}

long snd_pcm_avail_update(void* pcm) {
  (void)pcm;
  if (stub_inject_epipe_avail > 0) {
    stub_inject_epipe_avail--;
    return -EPIPE;
  }
  return STUB_RING_FRAMES;  // the fake device always drains
}

int snd_pcm_wait(void* pcm, int timeout) { (void)pcm; (void)timeout; return 1; }

int snd_pcm_mmap_begin(void* pcm, const area_t** areas,
                       unsigned long* offset, unsigned long* frames) {
  (void)pcm;
  static area_t a[STUB_MAX_CH];
  for (int c = 0; c < g_channels; c++) {
    a[c].addr = g_ring;
    a[c].first = (unsigned)(c * 16);
    a[c].step = (unsigned)(g_channels * 16);
  }
  *areas = a;
  unsigned long off = g_pos % STUB_RING_FRAMES;
  unsigned long room = STUB_RING_FRAMES - off;  // stay inside the ring
  if (*frames > room) *frames = room;
  *offset = off;
  return 0;
}

long snd_pcm_mmap_commit(void* pcm, unsigned long offset,
                         unsigned long frames) {
  (void)pcm;
  capture(g_ring + offset * g_channels, (long)frames);
  g_pos += frames;
  return (long)frames;
}

int snd_pcm_state(void* pcm) { (void)pcm; return g_running ? 3 : 2; }
int snd_pcm_start(void* pcm) {
  (void)pcm; stub_start_calls++; g_running = 1; return 0;
}
