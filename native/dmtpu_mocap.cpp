// dmtpu_mocap — native mocap ingestion for deepmimic_mujoco_tpu.
//
// Implements the DeepMimic motion-clip conversion pipeline (the framework's
// data-ingestion path) in C++: JSON clip parsing plus frame conversion to
// MuJoCo-layout qpos/qvel arrays with the exact semantics of
// deepmimic_mujoco_tpu/mocap/loader.py (which mirrors the reference's
// MocapDM, /root/reference/src/mujoco/mocap_v2.py:24-149):
//   * Y-up -> Z-up alignment: pos (x,y,z)->(x,-z,y); quat v -> (vx,-vz,vy)
//   * spherical joints -> intrinsic-xyz euler hinge triples
//   * frame k velocities over duration[k-1] with the reference's
//     (curr, prev) angular-velocity argument order
//
// Exposed as a C ABI for ctypes.  No external dependencies.
//
// Build: make -C native   (produces libdmtpu_mocap.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kFrameWidth = 44;   // humanoid3d clip frame floats
constexpr int kNQ = 35;
constexpr int kNV = 34;

// joint layout tables (mocap_util.py:5-29)
// DP order with dof: chest3 neck3 r_hip3 r_knee1 r_ankle3 r_shoulder3
//                    r_elbow1 l_hip3 l_knee1 l_ankle3 l_shoulder3 l_elbow1
const int kDpDofs[12] = {3, 3, 3, 1, 3, 3, 1, 3, 1, 3, 3, 1};

struct Quat { double w, x, y, z; };

Quat qmul(const Quat& a, const Quat& b) {
  return {a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
          a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
          a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
          a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w};
}

Quat qconj(const Quat& q) { return {q.w, -q.x, -q.y, -q.z}; }

// pyquaternion axis/angle semantics: normalize, angle wrapped to (-pi, pi]
void axis_angle(Quat q, double axis[3], double* angle) {
  double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  q.w /= n; q.x /= n; q.y /= n; q.z /= n;
  double vn = std::sqrt(q.x * q.x + q.y * q.y + q.z * q.z);
  double a = 2.0 * std::atan2(vn, q.w);
  if (a > M_PI) a -= 2.0 * M_PI;
  *angle = a;
  if (vn > 1e-12) {
    axis[0] = q.x / vn; axis[1] = q.y / vn; axis[2] = q.z / vn;
  } else {
    axis[0] = axis[1] = axis[2] = 0.0;
  }
}

// rot_vel(q0, q1, dt) = axis-angle of q0* ⊗ q1 / dt
void rot_vel(const Quat& q0, const Quat& q1, double dt, double out[3]) {
  Quat d = qmul(qconj(q0), q1);
  double axis[3], angle;
  axis_angle(d, axis, &angle);
  out[0] = angle / dt * axis[0];
  out[1] = angle / dt * axis[1];
  out[2] = angle / dt * axis[2];
}

// intrinsic-xyz euler extraction (Gohlke 'rxyz'-equivalent, verified against
// /root/reference/src/transformations.py:1089)
void euler_rxyz(Quat q, double e[3]) {
  double n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  q.w /= n; q.x /= n; q.y /= n; q.z /= n;
  const double w = q.w, x = q.x, y = q.y, z = q.z;
  const double m00 = 1 - 2 * (y * y + z * z);
  const double m01 = 2 * (x * y - w * z);
  const double m02 = 2 * (x * z + w * y);
  const double m10 = 2 * (x * y + w * z);
  const double m11 = 1 - 2 * (x * x + z * z);
  const double m12 = 2 * (y * z - w * x);
  const double m22 = 1 - 2 * (x * x + y * y);
  const double cy = std::hypot(m00, m01);
  if (cy > 1e-8) {
    e[0] = std::atan2(-m12, m22);
    e[1] = std::atan2(m02, cy);
    e[2] = std::atan2(-m01, m00);
  } else {
    e[0] = 0.0;
    e[1] = std::atan2(m02, cy);
    e[2] = std::atan2(m10, m11);
  }
}

Quat align_quat(const Quat& q) {  // conjugation by Rx(+90deg): v->(vx,-vz,vy)
  return {q.w, q.x, -q.z, q.y};
}

void align_pos(const double p[3], double out[3]) {
  out[0] = p[0]; out[1] = -p[2]; out[2] = p[1];
}

}  // namespace

extern "C" {

// Convert raw frames (T x 44, row-major, original file values) to
// qpos (T x 35) and qvel (T x 34).  Returns 0 on success.
int dmtpu_convert_frames(const double* frames, int64_t T, int64_t W,
                         double* qpos, double* qvel) {
  if (W != kFrameWidth || T < 1) return -1;

  // per-frame aligned quantities in MuJoCo joint order:
  // root_pos(3), root_quat(4), then 12 joints (quat4 or scalar1)
  std::vector<double> aligned(T * (3 + 4 + 8 * 4 + 4));

  // DP-order joint table: dof and file offset
  int dp_file_off[12];
  {
    int off = 8;
    for (int j = 0; j < 12; ++j) {
      dp_file_off[j] = off;
      off += (kDpDofs[j] == 3) ? 4 : 1;
    }
  }
  // MuJoCo-order list of (dp index); see mocap_util.py joint name tables
  // MuJoCo order:  chest neck r_shoulder r_elbow l_shoulder l_elbow
  //                r_hip r_knee r_ankle l_hip l_knee l_ankle
  // DP order:      chest neck r_hip r_knee r_ankle r_shoulder r_elbow
  //                l_hip l_knee l_ankle l_shoulder l_elbow
  const int mj2dp[12] = {0, 1, 5, 6, 10, 11, 2, 3, 4, 7, 8, 9};
  const int mj_dofs[12] = {3, 3, 3, 1, 3, 1, 3, 1, 3, 3, 1, 3};

  // aligned-layout offsets per MuJoCo joint
  int al_off[12];
  {
    int off = 7;
    for (int j = 0; j < 12; ++j) {
      al_off[j] = off;
      off += (mj_dofs[j] == 3) ? 4 : 1;
    }
  }
  const int al_width = 7 + 8 * 4 + 4;  // 43

  for (int64_t k = 0; k < T; ++k) {
    const double* f = frames + k * W;
    double* al = aligned.data() + k * al_width;
    align_pos(f + 1, al);
    Quat rq = align_quat({f[4], f[5], f[6], f[7]});
    al[3] = rq.w; al[4] = rq.x; al[5] = rq.y; al[6] = rq.z;
    for (int j = 0; j < 12; ++j) {
      const int dp = mj2dp[j];
      const double* src = f + dp_file_off[dp];
      double* dst = al + al_off[j];
      if (mj_dofs[j] == 3) {
        Quat q = align_quat({src[0], src[1], src[2], src[3]});
        dst[0] = q.w; dst[1] = q.x; dst[2] = q.y; dst[3] = q.z;
      } else {
        dst[0] = src[0];
      }
    }
  }

  for (int64_t k = 0; k < T; ++k) {
    const double dura = (k == 0) ? frames[0] : frames[(k - 1) * W];
    const double* al = aligned.data() + k * al_width;
    const double* al_prev = aligned.data() + (k > 0 ? k - 1 : 0) * al_width;
    double* qp = qpos + k * kNQ;
    double* qv = qvel + k * kNV;

    // root
    qp[0] = al[0]; qp[1] = al[1]; qp[2] = al[2];
    qp[3] = al[3]; qp[4] = al[4]; qp[5] = al[5]; qp[6] = al[6];
    if (k == 0) {
      std::memset(qv, 0, sizeof(double) * kNV);
    } else {
      for (int i = 0; i < 3; ++i) qv[i] = (al[i] - al_prev[i]) / dura;
      // reference (curr, prev) order quirk (mocap_v2.py:113)
      rot_vel({al[3], al[4], al[5], al[6]},
              {al_prev[3], al_prev[4], al_prev[5], al_prev[6]}, dura, qv + 3);
    }

    int qp_off = 7, qv_off = 6;
    for (int j = 0; j < 12; ++j) {
      const double* a = al + al_off[j];
      const double* ap = al_prev + al_off[j];
      if (mj_dofs[j] == 3) {
        euler_rxyz({a[0], a[1], a[2], a[3]}, qp + qp_off);
        if (k > 0) {
          rot_vel({a[0], a[1], a[2], a[3]}, {ap[0], ap[1], ap[2], ap[3]},
                  dura, qv + qv_off);
        }
        qp_off += 3; qv_off += 3;
      } else {
        qp[qp_off] = a[0];
        if (k > 0) qv[qv_off] = (a[0] - ap[0]) / dura;
        qp_off += 1; qv_off += 1;
      }
    }
  }
  return 0;
}

// Minimal JSON reader for the DeepMimic clip schema: extracts the "Frames"
// numeric array and the "Loop" string.  Returns frame count (T) or -1;
// caller provides a buffer of capacity max_vals doubles and reads W=44.
int64_t dmtpu_parse_clip(const char* path, double* out, int64_t max_vals,
                         char* loop_out, int64_t loop_cap) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, fp) != static_cast<size_t>(size)) {
    std::fclose(fp);
    return -1;
  }
  std::fclose(fp);
  buf[size] = 0;

  // "Loop": "<value>"
  const char* loop_key = std::strstr(buf.data(), "\"Loop\"");
  if (loop_key && loop_out && loop_cap > 0) {
    const char* q1 = std::strchr(loop_key + 6, ':');
    q1 = q1 ? std::strchr(q1, '"') : nullptr;
    if (q1) {
      const char* q2 = std::strchr(q1 + 1, '"');
      if (q2) {
        int64_t n = q2 - q1 - 1;
        if (n >= loop_cap) n = loop_cap - 1;
        std::memcpy(loop_out, q1 + 1, n);
        loop_out[n] = 0;
      }
    }
  }

  const char* frames = std::strstr(buf.data(), "\"Frames\"");
  if (!frames) return -1;
  const char* p = std::strchr(frames, '[');
  if (!p) return -1;

  int64_t count = 0;
  const char* end = buf.data() + size;
  while (p < end) {
    // scan to next number or closing of the outer array
    while (p < end && !(*p == '-' || (*p >= '0' && *p <= '9'))) {
      if (*p == ']') {
        // two consecutive closings end the Frames array; detect by lookahead
        const char* q = p + 1;
        while (q < end && (*q == ' ' || *q == '\n' || *q == '\r' || *q == '\t' || *q == ',')) ++q;
        if (q >= end || *q == ']' || *q == '}') {
          if (count % kFrameWidth != 0) return -1;
          return count / kFrameWidth;
        }
      }
      ++p;
    }
    if (p >= end) break;
    char* next = nullptr;
    double v = std::strtod(p, &next);
    if (next == p) break;
    if (count >= max_vals) return -1;
    out[count++] = v;
    p = next;
  }
  if (count % kFrameWidth != 0) return -1;
  return count / kFrameWidth;
}

}  // extern "C"
