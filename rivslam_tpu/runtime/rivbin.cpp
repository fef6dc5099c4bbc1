// rivbin — native runtime: memory-mapped radar sequence container and a
// double-buffered prefetching frame loader.
//
// This is the TPU-native replacement for the runtime role the reference
// delegates to ROS: rosbag storage + topic plumbing + nodelet pipelining
// (bag_player.py, preprocessing ingest). The container stores ragged
// per-frame radar targets and the IMU stream in one mmap-able file; the
// loader pads frames to a fixed capacity on background threads so the
// Python/JAX side consumes ready-made fixed-shape buffers without touching
// the decode path (host CPU work overlaps device compute).
//
// File layout (little endian):
//   header: magic "RIVB" u32 | version u32 | num_frames u64 | num_targets u64
//           | num_imu u64
//   frame index: (stamp f64, offset u64, count u64) * num_frames
//   targets: xyz f32[num_targets*3] | doppler f32[num_targets]
//            | intensity f32[num_targets]
//   imu: stamps f64[num_imu] | acc f32[num_imu*3] | gyr f32[num_imu*3]

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x42564952;  // "RIVB"
constexpr uint32_t kVersion = 1;

#pragma pack(push, 1)
struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t num_frames;
  uint64_t num_targets;
  uint64_t num_imu;
};
struct FrameIndex {
  double stamp;
  uint64_t offset;
  uint64_t count;
};
#pragma pack(pop)

struct Sequence {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  const FrameIndex* index = nullptr;
  const float* xyz = nullptr;
  const float* doppler = nullptr;
  const float* intensity = nullptr;
  const double* imu_stamps = nullptr;
  const float* imu_acc = nullptr;
  const float* imu_gyr = nullptr;
};

struct Frame {
  double stamp;
  std::vector<float> xyz;        // capacity*3, padded with zeros
  std::vector<float> doppler;    // capacity
  std::vector<float> intensity;  // capacity
  std::vector<uint8_t> mask;     // capacity
  int64_t index;
};

// Prefetching loader: worker threads pad frames ahead of the consumer.
struct Loader {
  Sequence* seq = nullptr;
  int64_t capacity = 0;
  int64_t next_to_schedule = 0;
  int64_t next_to_emit = 0;
  size_t max_queue = 8;
  std::deque<Frame> ready;  // sorted by index on emit
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> scheduled{0};
  double last_emitted_stamp = -1.0;
  bool emitted_any = false;

  void worker() {
    for (;;) {
      int64_t i;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop.load() ||
                 (next_to_schedule < (int64_t)seq->hdr.num_frames &&
                  ready.size() + (scheduled - next_to_emit - ready.size()) <
                      max_queue);
        });
        if (stop.load()) return;
        if (next_to_schedule >= (int64_t)seq->hdr.num_frames) return;
        i = next_to_schedule++;
        scheduled++;
      }
      Frame f = pad_frame(i);
      {
        std::unique_lock<std::mutex> lk(mu);
        // insert keeping index order
        auto it = ready.begin();
        while (it != ready.end() && it->index < f.index) ++it;
        ready.insert(it, std::move(f));
      }
      cv_ready.notify_all();
    }
  }

  Frame pad_frame(int64_t i) const {
    const FrameIndex& fi = seq->index[i];
    Frame f;
    f.index = i;
    f.stamp = fi.stamp;
    f.xyz.assign(capacity * 3, 0.f);
    f.doppler.assign(capacity, 0.f);
    f.intensity.assign(capacity, 0.f);
    f.mask.assign(capacity, 0);
    const int64_t n = std::min<int64_t>(fi.count, capacity);
    std::memcpy(f.xyz.data(), seq->xyz + fi.offset * 3, n * 3 * sizeof(float));
    std::memcpy(f.doppler.data(), seq->doppler + fi.offset, n * sizeof(float));
    std::memcpy(f.intensity.data(), seq->intensity + fi.offset,
                n * sizeof(float));
    std::memset(f.mask.data(), 1, n);
    return f;
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- container

void* rivbin_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Sequence();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;
  std::memcpy(&s->hdr, s->base, sizeof(Header));
  if (s->hdr.magic != kMagic || s->hdr.version != kVersion) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  const uint8_t* p = s->base + sizeof(Header);
  s->index = reinterpret_cast<const FrameIndex*>(p);
  p += sizeof(FrameIndex) * s->hdr.num_frames;
  s->xyz = reinterpret_cast<const float*>(p);
  p += sizeof(float) * 3 * s->hdr.num_targets;
  s->doppler = reinterpret_cast<const float*>(p);
  p += sizeof(float) * s->hdr.num_targets;
  s->intensity = reinterpret_cast<const float*>(p);
  p += sizeof(float) * s->hdr.num_targets;
  s->imu_stamps = reinterpret_cast<const double*>(p);
  p += sizeof(double) * s->hdr.num_imu;
  s->imu_acc = reinterpret_cast<const float*>(p);
  p += sizeof(float) * 3 * s->hdr.num_imu;
  s->imu_gyr = reinterpret_cast<const float*>(p);
  return s;
}

void rivbin_close(void* handle) {
  auto* s = static_cast<Sequence*>(handle);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

int64_t rivbin_num_frames(void* handle) {
  return static_cast<Sequence*>(handle)->hdr.num_frames;
}
int64_t rivbin_num_imu(void* handle) {
  return static_cast<Sequence*>(handle)->hdr.num_imu;
}
double rivbin_frame_stamp(void* handle, int64_t i) {
  return static_cast<Sequence*>(handle)->index[i].stamp;
}
int64_t rivbin_frame_count(void* handle, int64_t i) {
  return static_cast<Sequence*>(handle)->index[i].count;
}

// copy frame i padded to capacity into caller buffers
void rivbin_read_frame(void* handle, int64_t i, int64_t capacity, float* xyz,
                       float* doppler, float* intensity, uint8_t* mask) {
  auto* s = static_cast<Sequence*>(handle);
  const FrameIndex& fi = s->index[i];
  const int64_t n = std::min<int64_t>(fi.count, capacity);
  std::memset(xyz, 0, capacity * 3 * sizeof(float));
  std::memset(doppler, 0, capacity * sizeof(float));
  std::memset(intensity, 0, capacity * sizeof(float));
  std::memset(mask, 0, capacity);
  std::memcpy(xyz, s->xyz + fi.offset * 3, n * 3 * sizeof(float));
  std::memcpy(doppler, s->doppler + fi.offset, n * sizeof(float));
  std::memcpy(intensity, s->intensity + fi.offset, n * sizeof(float));
  std::memset(mask, 1, n);
}

// masked IMU window (t0, t1]; returns number of samples written
int64_t rivbin_imu_between(void* handle, double t0, double t1,
                           int64_t capacity, double* stamps, float* acc,
                           float* gyr) {
  auto* s = static_cast<Sequence*>(handle);
  const int64_t m = s->hdr.num_imu;
  // binary search lower bound for t0
  int64_t lo = 0, hi = m;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (s->imu_stamps[mid] <= t0)
      lo = mid + 1;
    else
      hi = mid;
  }
  int64_t k = 0;
  for (int64_t i = lo; i < m && k < capacity && s->imu_stamps[i] <= t1; ++i) {
    stamps[k] = s->imu_stamps[i];
    std::memcpy(acc + k * 3, s->imu_acc + i * 3, 3 * sizeof(float));
    std::memcpy(gyr + k * 3, s->imu_gyr + i * 3, 3 * sizeof(float));
    ++k;
  }
  return k;
}

// writer: one-shot serialization from flat arrays
int rivbin_write(const char* path, int64_t num_frames, const double* stamps,
                 const int64_t* offsets /* num_frames+1 */, const float* xyz,
                 const float* doppler, const float* intensity, int64_t num_imu,
                 const double* imu_stamps, const float* imu_acc,
                 const float* imu_gyr) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const int64_t num_targets = offsets[num_frames];
  Header hdr{kMagic, kVersion, (uint64_t)num_frames, (uint64_t)num_targets,
             (uint64_t)num_imu};
  fwrite(&hdr, sizeof(hdr), 1, f);
  for (int64_t i = 0; i < num_frames; ++i) {
    FrameIndex fi{stamps[i], (uint64_t)offsets[i],
                  (uint64_t)(offsets[i + 1] - offsets[i])};
    fwrite(&fi, sizeof(fi), 1, f);
  }
  fwrite(xyz, sizeof(float), num_targets * 3, f);
  fwrite(doppler, sizeof(float), num_targets, f);
  fwrite(intensity, sizeof(float), num_targets, f);
  fwrite(imu_stamps, sizeof(double), num_imu, f);
  fwrite(imu_acc, sizeof(float), num_imu * 3, f);
  fwrite(imu_gyr, sizeof(float), num_imu * 3, f);
  fclose(f);
  return 0;
}

// ------------------------------------------------------------------ loader

void* rivbin_loader_create(void* handle, int64_t capacity, int threads,
                           int max_queue) {
  auto* l = new Loader();
  l->seq = static_cast<Sequence*>(handle);
  l->capacity = capacity;
  l->max_queue = max_queue > 0 ? max_queue : 8;
  const int n = threads > 0 ? threads : 2;
  for (int i = 0; i < n; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// blocking: next frame in order; returns frame index or -1 at end
int64_t rivbin_loader_next(void* loader, float* xyz, float* doppler,
                           float* intensity, uint8_t* mask, double* stamp) {
  auto* l = static_cast<Loader*>(loader);
  std::unique_lock<std::mutex> lk(l->mu);
  if (l->next_to_emit >= (int64_t)l->seq->hdr.num_frames) return -1;
  const int64_t want = l->next_to_emit;
  l->cv_ready.wait(lk, [&] {
    return !l->ready.empty() && l->ready.front().index == want;
  });
  Frame f = std::move(l->ready.front());
  l->ready.pop_front();
  l->next_to_emit++;
  lk.unlock();
  l->cv_space.notify_all();
  std::memcpy(xyz, f.xyz.data(), f.xyz.size() * sizeof(float));
  std::memcpy(doppler, f.doppler.data(), f.doppler.size() * sizeof(float));
  std::memcpy(intensity, f.intensity.data(), f.intensity.size() * sizeof(float));
  std::memcpy(mask, f.mask.data(), f.mask.size());
  *stamp = f.stamp;
  return f.index;
}

// blocking: next frame in order, plus its IMU window aligned natively.
// The window is (prev_frame_stamp, stamp] (first frame: stamp-0.1), padded to
// imu_capacity; dts are successive differences clamped to [1e-4, 0.05]
// (utility_radar.h imuDeque consumption semantics — samples more than 50 ms
// apart are treated as 50 ms so one dropout cannot blow up preintegration).
// Returns frame index or -1 at end; *imu_count gets the sample count.
int64_t rivbin_loader_next_aligned(void* loader, float* xyz, float* doppler,
                                   float* intensity, uint8_t* mask,
                                   double* stamp, int64_t imu_capacity,
                                   double* imu_dts, float* imu_acc,
                                   float* imu_gyr, uint8_t* imu_mask,
                                   int64_t* imu_count) {
  auto* l = static_cast<Loader*>(loader);
  const int64_t idx =
      rivbin_loader_next(loader, xyz, doppler, intensity, mask, stamp);
  if (idx < 0) return idx;
  const double t1 = *stamp;
  double t0;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    t0 = l->emitted_any ? l->last_emitted_stamp : t1 - 0.1;
    l->last_emitted_stamp = t1;
    l->emitted_any = true;
  }
  std::memset(imu_dts, 0, imu_capacity * sizeof(double));
  std::memset(imu_acc, 0, imu_capacity * 3 * sizeof(float));
  std::memset(imu_gyr, 0, imu_capacity * 3 * sizeof(float));
  std::memset(imu_mask, 0, imu_capacity);
  std::vector<double> stamps(imu_capacity, 0.0);
  const int64_t k = rivbin_imu_between(l->seq, t0, t1, imu_capacity,
                                       stamps.data(), imu_acc, imu_gyr);
  double prev = t0;
  for (int64_t i = 0; i < k; ++i) {
    double dt = stamps[i] - prev;
    if (dt < 1e-4) dt = 1e-4;
    if (dt > 0.05) dt = 0.05;
    imu_dts[i] = dt;
    imu_mask[i] = 1;
    prev = stamps[i];
  }
  *imu_count = k;
  return idx;
}

void rivbin_loader_destroy(void* loader) {
  auto* l = static_cast<Loader*>(loader);
  l->stop.store(true);
  l->cv_space.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
