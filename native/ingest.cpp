// vapingest — native stream-ingestion engine for batched VAP serving.
//
// The reference serves ONE stream with three Python threads
// (rvap/vap_main/vap_main.py:338-527).  At thousands of concurrent
// dialogue streams, per-connection Python reader threads are the host
// bottleneck (SURVEY.md §7.3 "Host I/O at 50k streams"); this library
// owns the sockets natively:
//
// - one epoll IO thread accepts connections (connection == stream),
//   parses 10 ms hop packets (160 interleaved float64 pairs, the
//   reference wire format, README.md:164-186; or int16 pairs for 4x
//   lower wire bandwidth), and accumulates model frames per slot with
//   the 320-sample overlap semantics (vap_main.py:368-409).
// - completed frames land in a per-slot double buffer; the Python side
//   drains all ready frames in ONE ctypes call per tick straight into
//   the numpy array that feeds the jitted arena step (zero Python
//   per-connection work).
// - result payloads are queued back to each connection from the same
//   call (length-prefixed, like the reference result socket).
//
// Build: tools/build_native.py (g++ -O2 -shared -fPIC -pthread)
// Python binding: vap_realtime_tpu/io/native_ingest.py (ctypes).

#include <arpa/inet.h>
#include <atomic>
#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr int kHop = 160;                 // samples per 10 ms packet
constexpr int kPad = 320;                 // frame_contxt_padding (default)

constexpr int kRing = 4;                  // per-slot ready-frame queue

struct Slot {
  int fd = -1;
  bool active = false;
  // rolling accumulation buffers (frame_samples floats per channel;
  // int16 raw samples instead when the engine runs in emit_i16 mode —
  // the consumer normalizes on the accelerator, quartering the
  // host->device transfer)
  std::vector<float> acc1, acc2;
  std::vector<int16_t> acc1_i, acc2_i;
  int fill = 0;                            // samples accumulated
  // parse buffer for partial packets
  std::vector<uint8_t> inbuf;
  // ready-frame ring: kRing frames of (2 * frame_samples); drop-oldest
  // only when the consumer lags by a full ring (realtime semantics)
  std::vector<float> ready;
  std::vector<int16_t> ready_i;
  std::atomic<uint32_t> wpos{0}, rpos{0};
  // outgoing bytes
  std::vector<uint8_t> outbuf;
  std::mutex out_mu;
  uint64_t frames = 0;
  // bumped on every (re)allocation so the consumer detects slot reuse
  std::atomic<uint32_t> gen{0};
};

// One tick's deferred result build+send work (vap_ingest_send_results):
// the echo audio and probability rows are snapshotted at call time (so
// the caller's buffers are free immediately) and a dedicated builder
// thread does the f64 wire serialization + per-slot queueing OVERLAPPED
// with the caller's next tick — the serialization pass was the largest
// host-CPU item of the serving tick (~43 ms at 4096 streams, measured
// with the device stubbed; tools/serving_bench.py --stub_device).
struct SendJob {
  std::vector<int32_t> slots;     // n kept targets
  std::vector<uint32_t> gens;     // dispatch-time generation per target
  double t = 0.0;
  int L = 0;                      // echo samples per channel (post-pad)
  bool i16 = false;               // echo as raw int16 (scale 1/32768)
  std::vector<int16_t> echo_i;    // (n, 2, L)
  std::vector<float> echo_f;      // (n, 2, L)
  std::vector<float> probs;       // (n, P)
  std::vector<int32_t> cols;      // per-field widths, sum == P
};

struct Engine {
  int listen_fd = -1;
  int epfd = -1;
  int wake_r = -1, wake_w = -1;            // self-pipe for shutdown
  int capacity = 0;
  int frame_samples = 0;
  // samples kept as the next frame's left context (320 for the
  // reference overlap semantics, 0 for the fast path's fresh-sample
  // chunks — runtime/incremental.py fast_step)
  int overlap = kPad;
  bool wire_int16 = false;
  bool emit_i16 = false;   // publish int16 frames (requires wire_int16)
  uint16_t port = 0;
  std::vector<Slot> slots;
  std::vector<int> fd2slot;                // fd -> slot (sized by fd)
  std::mutex mu;                           // slot alloc/free
  std::thread io;
  std::atomic<bool> stop{false};
  std::atomic<int> n_active{0};
  // result-builder thread (overlapped wire serialization)
  std::thread builder;
  std::mutex job_mu;
  std::condition_variable job_cv;
  std::deque<std::unique_ptr<SendJob>> jobs;
  std::atomic<int> jobs_pending{0};        // queued + in-flight
  std::atomic<int> jobs_dropped{0};        // overload catch-up drops

  int alloc_slot(int fd) {
    std::lock_guard<std::mutex> g(mu);
    for (int i = 0; i < capacity; i++) {
      if (!slots[i].active) {
        Slot &s = slots[i];
        s.fd = fd;
        s.active = true;
        s.fill = overlap;  // reference zero left-context (vap_main.py:368)
        std::fill(s.acc1.begin(), s.acc1.end(), 0.f);
        std::fill(s.acc2.begin(), s.acc2.end(), 0.f);
        std::fill(s.acc1_i.begin(), s.acc1_i.end(), (int16_t)0);
        std::fill(s.acc2_i.begin(), s.acc2_i.end(), (int16_t)0);
        s.inbuf.clear();
        s.wpos.store(0);
        s.rpos.store(0);
        s.gen.fetch_add(1);
        {
          std::lock_guard<std::mutex> g2(s.out_mu);
          s.outbuf.clear();
        }
        s.frames = 0;
        if ((int)fd2slot.size() <= fd) fd2slot.resize(fd + 1, -1);
        fd2slot[fd] = i;
        n_active.fetch_add(1);
        return i;
      }
    }
    return -1;
  }

  void free_slot(int slot) {
    std::lock_guard<std::mutex> g(mu);
    Slot &s = slots[slot];
    if (!s.active) return;
    if (s.fd >= 0 && s.fd < (int)fd2slot.size()) fd2slot[s.fd] = -1;
    if (s.fd >= 0) ::close(s.fd);
    s.fd = -1;
    s.active = false;
    n_active.fetch_sub(1);
  }
};

void parse_hops(Engine *e, Slot &s) {
  const size_t pkt = e->wire_int16 ? (size_t)(2 * 2 * kHop)
                                   : (size_t)(8 * 2 * kHop);
  size_t off = 0;
  while (s.inbuf.size() - off >= pkt) {
    const uint8_t *p = s.inbuf.data() + off;
    int room = e->frame_samples - s.fill;
    int take = kHop < room ? kHop : room;
    if (e->emit_i16) {
      const int16_t *v = reinterpret_cast<const int16_t *>(p);
      for (int i = 0; i < take; i++) {
        s.acc1_i[s.fill + i] = v[2 * i];
        s.acc2_i[s.fill + i] = v[2 * i + 1];
      }
    } else if (e->wire_int16) {
      const int16_t *v = reinterpret_cast<const int16_t *>(p);
      for (int i = 0; i < take; i++) {
        s.acc1[s.fill + i] = (float)v[2 * i] / 32768.f;
        s.acc2[s.fill + i] = (float)v[2 * i + 1] / 32768.f;
      }
    } else {
      const double *v = reinterpret_cast<const double *>(p);
      for (int i = 0; i < take; i++) {
        s.acc1[s.fill + i] = (float)v[2 * i];
        s.acc2[s.fill + i] = (float)v[2 * i + 1];
      }
    }
    s.fill += take;
    off += pkt;
    if (s.fill >= e->frame_samples) {
      // frame complete -> publish into the ready ring; if the ring is
      // full the OLDEST unread frame is overwritten (realtime catch-up)
      uint32_t w = s.wpos.load(std::memory_order_relaxed);
      uint32_t r = s.rpos.load(std::memory_order_acquire);
      if (w - r >= kRing) {
        s.rpos.store(w - kRing + 1, std::memory_order_release);
      }
      if (e->emit_i16) {
        int16_t *dst = s.ready_i.data() +
                       (size_t)(w % kRing) * 2 * e->frame_samples;
        std::memcpy(dst, s.acc1_i.data(),
                    e->frame_samples * sizeof(int16_t));
        std::memcpy(dst + e->frame_samples, s.acc2_i.data(),
                    e->frame_samples * sizeof(int16_t));
      } else {
        float *dst = s.ready.data() +
                     (size_t)(w % kRing) * 2 * e->frame_samples;
        std::memcpy(dst, s.acc1.data(), e->frame_samples * sizeof(float));
        std::memcpy(dst + e->frame_samples, s.acc2.data(),
                    e->frame_samples * sizeof(float));
      }
      s.wpos.store(w + 1, std::memory_order_release);
      s.frames++;
      // keep last `overlap` samples as the next frame's left context
      // (overlap == 0 on the fast path: frames are disjoint)
      if (e->overlap > 0) {
        if (e->emit_i16) {
          std::memmove(s.acc1_i.data(),
                       s.acc1_i.data() + e->frame_samples - e->overlap,
                       e->overlap * sizeof(int16_t));
          std::memmove(s.acc2_i.data(),
                       s.acc2_i.data() + e->frame_samples - e->overlap,
                       e->overlap * sizeof(int16_t));
        } else {
          std::memmove(s.acc1.data(),
                       s.acc1.data() + e->frame_samples - e->overlap,
                       e->overlap * sizeof(float));
          std::memmove(s.acc2.data(),
                       s.acc2.data() + e->frame_samples - e->overlap,
                       e->overlap * sizeof(float));
        }
      }
      s.fill = e->overlap;
      // note: a hop never straddles a frame boundary because
      // (frame_samples - overlap) % kHop == 0 for all supported rates
      if (take < kHop) {
        // defensive: shouldn't happen given the invariant above
        s.fill += kHop - take;
      }
    }
  }
  if (off > 0) s.inbuf.erase(s.inbuf.begin(), s.inbuf.begin() + off);
}

void io_loop(Engine *e) {
  std::vector<epoll_event> evs(256);
  while (!e->stop.load()) {
    int n = epoll_wait(e->epfd, evs.data(), (int)evs.size(), 200);
    for (int i = 0; i < n; i++) {
      int fd = evs[i].data.fd;
      if (fd == e->wake_r) {
        char b[16];
        (void)!read(e->wake_r, b, sizeof b);
        continue;
      }
      if (fd == e->listen_fd) {
        for (;;) {
          int c = accept4(e->listen_fd, nullptr, nullptr, SOCK_NONBLOCK);
          if (c < 0) break;
          int one = 1;
          setsockopt(c, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
          int slot = e->alloc_slot(c);
          if (slot < 0) {
            ::close(c);  // at capacity
            continue;
          }
          epoll_event ev{};
          ev.events = EPOLLIN | EPOLLRDHUP;
          ev.data.fd = c;
          epoll_ctl(e->epfd, EPOLL_CTL_ADD, c, &ev);
        }
        continue;
      }
      int slot = fd < (int)e->fd2slot.size() ? e->fd2slot[fd] : -1;
      if (slot < 0) continue;
      Slot &s = e->slots[slot];
      if (evs[i].events & (EPOLLHUP | EPOLLRDHUP | EPOLLERR)) {
        epoll_ctl(e->epfd, EPOLL_CTL_DEL, fd, nullptr);
        e->free_slot(slot);
        continue;
      }
      if (evs[i].events & EPOLLIN) {
        uint8_t buf[1 << 16];
        for (;;) {
          ssize_t r = recv(fd, buf, sizeof buf, 0);
          if (r > 0) {
            s.inbuf.insert(s.inbuf.end(), buf, buf + r);
          } else if (r == 0) {
            epoll_ctl(e->epfd, EPOLL_CTL_DEL, fd, nullptr);
            e->free_slot(slot);
            break;
          } else {
            break;  // EAGAIN
          }
          if (r < (ssize_t)sizeof buf) break;
        }
        if (s.active) parse_hops(e, s);
      }
    }
    // drain pending sends (best effort, non-blocking)
    for (int sl = 0; sl < e->capacity; sl++) {
      Slot &s = e->slots[sl];
      if (!s.active) continue;
      std::lock_guard<std::mutex> g(s.out_mu);
      while (!s.outbuf.empty()) {
        ssize_t w = send(s.fd, s.outbuf.data(), s.outbuf.size(),
                         MSG_NOSIGNAL);
        if (w <= 0) break;
        s.outbuf.erase(s.outbuf.begin(), s.outbuf.begin() + w);
      }
    }
  }
}

inline void put_u32(uint8_t *p, uint32_t v) { std::memcpy(p, &v, 4); }
inline void put_d(uint8_t *p, double v) { std::memcpy(p, &v, 8); }

// Serialize one job's rows to the reference result wire format and
// queue them per connection — byte-identical to
// wire.serialize_results_batch(as_matrix=True) + frame_result:
//   u32 payload_len | f64 t | per field: u32 count | f64 data
// (field order x1, x2, then the mode's probability fields).
void builder_loop(Engine *e) {
  while (true) {
    std::unique_ptr<SendJob> job;
    {
      std::unique_lock<std::mutex> lk(e->job_mu);
      e->job_cv.wait(lk,
                     [e] { return e->stop.load() || !e->jobs.empty(); });
      if (e->jobs.empty()) {
        if (e->stop.load()) return;
        continue;
      }
      job = std::move(e->jobs.front());
      e->jobs.pop_front();
    }
    const int n = (int)job->slots.size();
    const int L = job->L;
    int P = 0;
    for (int c : job->cols) P += c;
    size_t pay = 8 + 2 * (4 + 8 * (size_t)L);
    for (int c : job->cols) pay += 4 + 8 * (size_t)c;
    const size_t total = 4 + pay;
    std::vector<uint8_t> row(total);
    put_u32(row.data(), (uint32_t)pay);
    put_d(row.data() + 4, job->t);
    for (int i = 0; i < n; i++) {
      uint8_t *w = row.data() + 12;
      for (int ch = 0; ch < 2; ch++) {
        put_u32(w, (uint32_t)L);
        w += 4;
        if (job->i16) {
          const int16_t *src =
              job->echo_i.data() + ((size_t)i * 2 + ch) * L;
          for (int k = 0; k < L; k++)
            put_d(w + 8 * (size_t)k, (double)src[k] * (1.0 / 32768.0));
        } else {
          const float *src =
              job->echo_f.data() + ((size_t)i * 2 + ch) * L;
          for (int k = 0; k < L; k++)
            put_d(w + 8 * (size_t)k, (double)src[k]);
        }
        w += 8 * (size_t)L;
      }
      const float *pr = job->probs.data() + (size_t)i * P;
      for (int c : job->cols) {
        put_u32(w, (uint32_t)c);
        w += 4;
        for (int k = 0; k < c; k++) put_d(w + 8 * (size_t)k,
                                          (double)pr[k]);
        pr += c;
        w += 8 * (size_t)c;
      }
      // deliver only if the connection is still the SAME one the
      // result was computed for (generation check closes the
      // dispatch->send reuse race entirely)
      int sl = job->slots[i];
      Slot &s = e->slots[sl];
      if (s.active &&
          s.gen.load(std::memory_order_acquire) == job->gens[i]) {
        std::lock_guard<std::mutex> g(s.out_mu);
        s.outbuf.insert(s.outbuf.end(), row.data(), row.data() + total);
      }
    }
    e->jobs_pending.fetch_sub(1);
    if (e->wake_w >= 0) (void)!write(e->wake_w, "x", 1);  // drain now
  }
}

}  // namespace

extern "C" {

void *vap_ingest_create(uint16_t port, int capacity, int frame_samples,
                        int wire_int16, int overlap) {
  // emit_i16: wire_int16 == 2 publishes raw int16 frames (normalize on
  // the accelerator — 4x lower host->device transfer than float32)
  Engine *e = new Engine();
  e->capacity = capacity;
  e->frame_samples = frame_samples;
  e->wire_int16 = wire_int16 != 0;
  e->emit_i16 = wire_int16 == 2;
  e->overlap = overlap < 0 ? kPad : overlap;
  e->slots = std::vector<Slot>(capacity);
  for (auto &s : e->slots) {
    if (e->emit_i16) {
      s.acc1_i.assign(frame_samples, 0);
      s.acc2_i.assign(frame_samples, 0);
      s.ready_i.assign((size_t)kRing * 2 * frame_samples, 0);
    } else {
      s.acc1.assign(frame_samples, 0.f);
      s.acc2.assign(frame_samples, 0.f);
      s.ready.assign((size_t)kRing * 2 * frame_samples, 0.f);
    }
  }

  e->listen_fd = socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK, 0);
  int one = 1;
  setsockopt(e->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port);
  if (bind(e->listen_fd, (sockaddr *)&addr, sizeof addr) != 0 ||
      listen(e->listen_fd, 1024) != 0) {
    ::close(e->listen_fd);
    delete e;
    return nullptr;
  }
  socklen_t alen = sizeof addr;
  getsockname(e->listen_fd, (sockaddr *)&addr, &alen);
  e->port = ntohs(addr.sin_port);

  e->epfd = epoll_create1(0);
  int pipefd[2];
  if (pipe(pipefd) == 0) {
    e->wake_r = pipefd[0];
    e->wake_w = pipefd[1];
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = e->wake_r;
    epoll_ctl(e->epfd, EPOLL_CTL_ADD, e->wake_r, &ev);
  }
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = e->listen_fd;
  epoll_ctl(e->epfd, EPOLL_CTL_ADD, e->listen_fd, &ev);
  e->io = std::thread(io_loop, e);
  e->builder = std::thread(builder_loop, e);
  return e;
}

uint16_t vap_ingest_port(void *h) { return ((Engine *)h)->port; }

// Generation of a slot (bumped on every reuse); 0 = never used.
uint32_t vap_ingest_gen(void *h, int slot) {
  Engine *e = (Engine *)h;
  if (slot < 0 || slot >= e->capacity) return 0;
  return e->slots[slot].gen.load(std::memory_order_acquire);
}

int vap_ingest_active(void *h) { return ((Engine *)h)->n_active.load(); }

// All slots' generation counters in one call (out: capacity uint32s).
void vap_ingest_gens(void *h, uint32_t *out) {
  Engine *e = (Engine *)h;
  for (int i = 0; i < e->capacity; i++)
    out[i] = e->slots[i].gen.load(std::memory_order_acquire);
}

// Drain ONE ready frame per slot that has any: frames_out must hold
// capacity*2*frame_samples floats (slot-major); slots_out receives the
// slot ids.  Returns count.  Call repeatedly to drain deeper backlogs
// (one frame per slot per arena tick is the realtime cadence anyway).
int vap_ingest_poll(void *h, float *frames_out, int *slots_out,
                    int max_slots) {
  Engine *e = (Engine *)h;
  int n = 0;
  for (int sl = 0; sl < e->capacity && n < max_slots; sl++) {
    Slot &s = e->slots[sl];
    if (!s.active) continue;
    uint32_t r = s.rpos.load(std::memory_order_relaxed);
    if (s.wpos.load(std::memory_order_acquire) == r) continue;
    const float *src = s.ready.data() +
                       (size_t)(r % kRing) * 2 * e->frame_samples;
    std::memcpy(frames_out + (size_t)sl * 2 * e->frame_samples, src,
                2 * e->frame_samples * sizeof(float));
    s.rpos.store(r + 1, std::memory_order_release);
    slots_out[n++] = sl;
  }
  return n;
}

// emit_i16-mode drain: raw int16 frames (consumer normalizes /32768).
int vap_ingest_poll_i16(void *h, int16_t *frames_out, int *slots_out,
                        int max_slots) {
  Engine *e = (Engine *)h;
  int n = 0;
  for (int sl = 0; sl < e->capacity && n < max_slots; sl++) {
    Slot &s = e->slots[sl];
    if (!s.active) continue;
    uint32_t r = s.rpos.load(std::memory_order_relaxed);
    if (s.wpos.load(std::memory_order_acquire) == r) continue;
    const int16_t *src = s.ready_i.data() +
                         (size_t)(r % kRing) * 2 * e->frame_samples;
    std::memcpy(frames_out + (size_t)sl * 2 * e->frame_samples, src,
                2 * e->frame_samples * sizeof(int16_t));
    s.rpos.store(r + 1, std::memory_order_release);
    slots_out[n++] = sl;
  }
  return n;
}

// Queue a result payload for a slot's connection.
int vap_ingest_send(void *h, int slot, const uint8_t *data, int len) {
  Engine *e = (Engine *)h;
  if (slot < 0 || slot >= e->capacity) return -1;
  Slot &s = e->slots[slot];
  if (!s.active) return -1;
  std::lock_guard<std::mutex> g(s.out_mu);
  s.outbuf.insert(s.outbuf.end(), data, data + len);
  return len;
}

// Snapshot one tick's results and serialize + queue them on the
// builder thread, OVERLAPPED with the caller's next tick.  slots/gens:
// n targets and their dispatch-time generations (slot < 0 = skip);
// frames: the poll buffer base (capacity, 2, frame_samples) in f32 or
// raw int16 (frames_i16); pad samples of left context are dropped from
// the echo; probs: (n, P) f32 row-major with ncols field widths
// summing to P.  The call itself only gathers the kept rows (one
// memcpy pass); wire bytes match wire.serialize_results_batch exactly.
int vap_ingest_send_results(void *h, const int32_t *slots,
                            const uint32_t *gens, int n, double t,
                            const void *frames, int frames_i16,
                            int frame_samples, int pad,
                            const float *probs, int P,
                            const int32_t *cols, int ncols) {
  Engine *e = (Engine *)h;
  auto job = std::unique_ptr<SendJob>(new SendJob());
  const int L = frame_samples - pad;
  job->t = t;
  job->L = L;
  job->i16 = frames_i16 != 0;
  job->cols.assign(cols, cols + ncols);
  job->slots.reserve(n);
  job->gens.reserve(n);
  if (job->i16)
    job->echo_i.reserve((size_t)n * 2 * L);
  else
    job->echo_f.reserve((size_t)n * 2 * L);
  job->probs.reserve((size_t)n * P);
  for (int i = 0; i < n; i++) {
    int sl = slots[i];
    if (sl < 0 || sl >= e->capacity) continue;
    job->slots.push_back(sl);
    job->gens.push_back(gens ? gens[i]
                             : e->slots[sl].gen.load());
    if (job->i16) {
      const int16_t *base =
          (const int16_t *)frames + (size_t)sl * 2 * frame_samples;
      job->echo_i.insert(job->echo_i.end(), base + pad,
                         base + frame_samples);
      job->echo_i.insert(job->echo_i.end(), base + frame_samples + pad,
                         base + 2 * frame_samples);
    } else {
      const float *base =
          (const float *)frames + (size_t)sl * 2 * frame_samples;
      job->echo_f.insert(job->echo_f.end(), base + pad,
                         base + frame_samples);
      job->echo_f.insert(job->echo_f.end(), base + frame_samples + pad,
                         base + 2 * frame_samples);
    }
    job->probs.insert(job->probs.end(), probs + (size_t)i * P,
                      probs + (size_t)(i + 1) * P);
  }
  int q = (int)job->slots.size();
  {
    std::lock_guard<std::mutex> g(e->job_mu);
    // realtime backpressure: if the builder is >2 ticks behind, drop
    // the OLDEST queued tick (catch-up semantics, like the ingest
    // ready-ring) so result latency stays bounded under overload
    while (e->jobs.size() >= 3) {
      e->jobs.pop_front();
      e->jobs_pending.fetch_sub(1);
      e->jobs_dropped.fetch_add(1);
    }
    e->jobs.push_back(std::move(job));
    e->jobs_pending.fetch_add(1);
  }
  e->job_cv.notify_one();
  return q;
}

// builder-queue depth (jobs snapshotted but not yet serialized) — a
// backpressure signal for the serving loop
int vap_ingest_send_pending(void *h) {
  return ((Engine *)h)->jobs_pending.load();
}

// ticks dropped whole by the overload catch-up policy
int vap_ingest_send_dropped(void *h) {
  return ((Engine *)h)->jobs_dropped.load();
}

// Queue one equal-length payload per slot in ONE call: data is n
// back-to-back `len`-byte payloads, slots[i] their targets.  Python's
// per-slot ctypes send loop costs ~25 us/result (~100 ms/tick at 4096
// streams); this is a native memcpy loop.  Returns #queued.
int vap_ingest_send_batch(void *h, const int *slots, int n,
                          const uint8_t *data, int len) {
  Engine *e = (Engine *)h;
  int q = 0;
  for (int i = 0; i < n; i++) {
    int slot = slots[i];
    if (slot < 0 || slot >= e->capacity) continue;
    Slot &s = e->slots[slot];
    if (!s.active) continue;
    const uint8_t *p = data + (size_t)i * len;
    std::lock_guard<std::mutex> g(s.out_mu);
    s.outbuf.insert(s.outbuf.end(), p, p + len);
    q++;
  }
  return q;
}

void vap_ingest_destroy(void *h) {
  Engine *e = (Engine *)h;
  e->stop.store(true);
  e->job_cv.notify_all();
  if (e->builder.joinable()) e->builder.join();
  if (e->wake_w >= 0) (void)!write(e->wake_w, "x", 1);
  if (e->io.joinable()) e->io.join();
  for (int sl = 0; sl < e->capacity; sl++) e->free_slot(sl);
  if (e->listen_fd >= 0) ::close(e->listen_fd);
  if (e->epfd >= 0) ::close(e->epfd);
  if (e->wake_r >= 0) ::close(e->wake_r);
  if (e->wake_w >= 0) ::close(e->wake_w);
  delete e;
}

}  // extern "C"
