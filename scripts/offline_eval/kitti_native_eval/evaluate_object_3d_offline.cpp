// KITTI offline object-detection evaluation (image / BEV / 3D AP + AOS).
//
// From-scratch implementation of the public KITTI devkit evaluation
// protocol, serving as the ground-truth scorer for this framework
// (the reference repo ships the devkit's evaluator; this reimplements
// the same protocol: 41 recall sample points, 11-point AP, per-class
// difficulty filtering, DontCare suppression, greedy matching).
//
// Usage: evaluate_object_3d_offline <gt_dir> <result_dir> [low]
//   gt_dir:     directory of KITTI label txts
//   result_dir: directory containing data/*.txt predictions
//   low:        optional; use the low IoU regime (0.5/0.25/0.25)
//
// Outputs
//   stdout: "<curve> AP: easy moderate hard" lines
//   <result_dir>/plot/<class>_detection[_BEV|_3D|_orientation].txt
//       41 rows of "recall p_easy p_mod p_hard"
//   <result_dir>/stats_<class>_detection[...].txt: precision rows

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <vector>

using namespace std;

static const int N_SAMPLE_PTS = 41;
static const double NO_DETECTION = -1e9;

enum Difficulty { EASY = 0, MODERATE = 1, HARD = 2 };
enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

static const char *CLASS_NAMES[] = {"car", "pedestrian", "cyclist"};
static const int NUM_CLASSES = 3;

// Difficulty thresholds (min 2D height px, max occlusion, max truncation)
static const int MIN_HEIGHT[3] = {40, 25, 25};
static const int MAX_OCCLUSION[3] = {0, 1, 2};
static const double MAX_TRUNCATION[3] = {0.15, 0.30, 0.50};

// Filled in main(): standard 0.7/0.5/0.5 or low 0.5/0.25/0.25 per class,
// used for all three metrics.
static double MIN_OVERLAP[3];

struct Box {
  string type;
  double truncation = 0, occlusion = 0, alpha = 0;
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;     // 2D box
  double h = 0, w = 0, l = 0;                // dimensions
  double tx = 0, ty = 0, tz = 0, ry = 0;     // location + yaw
  double score = 0;
};

// ---------------------------------------------------------------------------
// IO
// ---------------------------------------------------------------------------

static bool read_label_file(const string &path, bool is_result,
                            vector<Box> *out) {
  FILE *fp = fopen(path.c_str(), "r");
  if (!fp) return false;
  char type[1024];
  while (true) {
    Box b;
    double trash;
    int n;
    if (is_result) {
      n = fscanf(fp,
                 "%1023s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                 "%lf %lf %lf",
                 type, &b.truncation, &b.occlusion, &b.alpha, &b.x1,
                 &b.y1, &b.x2, &b.y2, &b.h, &b.w, &b.l, &b.tx, &b.ty,
                 &b.tz, &b.ry, &b.score);
      if (n != 16) break;
    } else {
      n = fscanf(fp,
                 "%1023s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                 "%lf %lf",
                 type, &b.truncation, &b.occlusion, &b.alpha, &b.x1,
                 &b.y1, &b.x2, &b.y2, &b.h, &b.w, &b.l, &b.tx, &b.ty,
                 &b.tz, &b.ry);
      if (n != 15) break;
    }
    (void)trash;
    b.type = type;
    // lowercase for class comparison
    for (auto &c : b.type) c = tolower(c);
    out->push_back(b);
  }
  fclose(fp);
  return true;
}

// ---------------------------------------------------------------------------
// Overlaps
// ---------------------------------------------------------------------------

// 2D box overlap. criterion: -1 = IoU, 0 = intersection / area(a)
static double image_overlap(const Box &a, const Box &b, int criterion) {
  double iw = min(a.x2, b.x2) - max(a.x1, b.x1);
  double ih = min(a.y2, b.y2) - max(a.y1, b.y1);
  if (iw <= 0 || ih <= 0) return 0.0;
  double inter = iw * ih;
  double area_a = (a.x2 - a.x1) * (a.y2 - a.y1);
  double area_b = (b.x2 - b.x1) * (b.y2 - b.y1);
  double denom = (criterion == 0) ? area_a : (area_a + area_b - inter);
  return denom > 0 ? inter / denom : 0.0;
}

struct Pt { double x, y; };

// Convex polygon clipping (Sutherland-Hodgman), for rotated-rect overlap
static vector<Pt> clip_poly(const vector<Pt> &subject,
                            const vector<Pt> &clip) {
  vector<Pt> out = subject;
  int n = clip.size();
  for (int i = 0; i < n && !out.empty(); i++) {
    Pt a = clip[i], b = clip[(i + 1) % n];
    double ex = b.x - a.x, ey = b.y - a.y;
    vector<Pt> input;
    input.swap(out);
    Pt prev = input.back();
    double prev_side = ex * (prev.y - a.y) - ey * (prev.x - a.x);
    for (const Pt &cur : input) {
      double side = ex * (cur.y - a.y) - ey * (cur.x - a.x);
      if (side >= 0) {
        if (prev_side < 0) {
          double t = prev_side / (prev_side - side);
          out.push_back({prev.x + t * (cur.x - prev.x),
                         prev.y + t * (cur.y - prev.y)});
        }
        out.push_back(cur);
      } else if (prev_side >= 0) {
        double t = prev_side / (prev_side - side);
        out.push_back({prev.x + t * (cur.x - prev.x),
                       prev.y + t * (cur.y - prev.y)});
      }
      prev = cur;
      prev_side = side;
    }
  }
  return out;
}

static double poly_area(const vector<Pt> &p) {
  double area = 0;
  int n = p.size();
  for (int i = 0; i < n; i++) {
    int j = (i + 1) % n;
    area += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return fabs(area) / 2.0;
}

// BEV footprint corners in the x-z plane (camera coords, y down),
// counterclockwise (the clipper keeps the left side of CCW edges)
static vector<Pt> bev_corners(const Box &b) {
  double c = cos(b.ry), s = sin(b.ry);
  double hl = b.l / 2.0, hw = b.w / 2.0;
  double lx[4] = {hl, -hl, -hl, hl};
  double lz[4] = {hw, hw, -hw, -hw};
  vector<Pt> out(4);
  for (int i = 0; i < 4; i++) {
    out[i] = {b.tx + c * lx[i] + s * lz[i],
              b.tz - s * lx[i] + c * lz[i]};
  }
  return out;
}

static double ground_overlap(const Box &a, const Box &b, int criterion) {
  vector<Pt> inter = clip_poly(bev_corners(a), bev_corners(b));
  if (inter.size() < 3) return 0.0;
  double inter_area = poly_area(inter);
  double area_a = a.l * a.w;
  double area_b = b.l * b.w;
  double denom = (criterion == 0) ? area_a
                                  : (area_a + area_b - inter_area);
  return denom > 0 ? inter_area / denom : 0.0;
}

static double box3d_overlap(const Box &a, const Box &b, int criterion) {
  vector<Pt> inter = clip_poly(bev_corners(a), bev_corners(b));
  if (inter.size() < 3) return 0.0;
  double inter_area = poly_area(inter);
  // y points down; box origin at bottom face
  double ymax = min(a.ty, b.ty);
  double ymin = max(a.ty - a.h, b.ty - b.h);
  double hi = ymax - ymin;
  if (hi <= 0) return 0.0;
  double inter_vol = inter_area * hi;
  double vol_a = a.l * a.w * a.h;
  double vol_b = b.l * b.w * b.h;
  double denom = (criterion == 0) ? vol_a
                                  : (vol_a + vol_b - inter_vol);
  return denom > 0 ? inter_vol / denom : 0.0;
}

static double overlap(Metric m, const Box &a, const Box &b,
                      int criterion) {
  switch (m) {
    case IMAGE: return image_overlap(a, b, criterion);
    case GROUND: return ground_overlap(a, b, criterion);
    default: return box3d_overlap(a, b, criterion);
  }
}

// ---------------------------------------------------------------------------
// Per-image GT/DET classification for one class + difficulty
// ---------------------------------------------------------------------------

struct Cleaned {
  vector<int> ignored_gt;    // 0 valid, 1 ignored, -1 other class
  vector<int> ignored_det;   // 0 valid, 1 too small, -1 other class
  vector<Box> dontcare;
  int n_gt = 0;
};

static Cleaned clean_data(int cls, const vector<Box> &gt,
                          const vector<Box> &det, int difficulty) {
  Cleaned out;
  const string cls_name = CLASS_NAMES[cls];

  for (const Box &g : gt) {
    if (g.type == "dontcare") {
      out.dontcare.push_back(g);
      out.ignored_gt.push_back(-1);
      continue;
    }
    int valid_class;
    if (g.type == cls_name) {
      valid_class = 1;
    } else if (cls_name == "car" && g.type == "van") {
      valid_class = 0;
    } else if (cls_name == "pedestrian" && g.type == "person_sitting") {
      valid_class = 0;
    } else {
      valid_class = -1;
    }

    double height = g.y2 - g.y1;
    bool too_hard = (g.occlusion > MAX_OCCLUSION[difficulty] ||
                     g.truncation > MAX_TRUNCATION[difficulty] ||
                     height <= MIN_HEIGHT[difficulty]);

    if (valid_class == 1 && !too_hard) {
      out.ignored_gt.push_back(0);
      out.n_gt++;
    } else if (valid_class == 0 || (valid_class == 1 && too_hard)) {
      out.ignored_gt.push_back(1);
    } else {
      out.ignored_gt.push_back(-1);
    }
  }

  for (const Box &d : det) {
    if (d.type != cls_name) {
      out.ignored_det.push_back(-1);
    } else if (d.y2 - d.y1 < MIN_HEIGHT[difficulty]) {
      out.ignored_det.push_back(1);
    } else {
      out.ignored_det.push_back(0);
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// Matching statistics for one image
// ---------------------------------------------------------------------------

struct Stats {
  int tp = 0, fp = 0, fn = 0;
  double similarity = 0;          // AOS numerator
  vector<double> tp_scores;       // scores of true positives (pass 1)
};

static Stats compute_statistics(int cls, Metric metric,
                                const vector<Box> &gt,
                                const vector<Box> &det,
                                const Cleaned &cl, bool compute_fp,
                                double thresh, bool compute_aos) {
  Stats st;
  vector<bool> assigned(det.size(), false);
  vector<bool> below_thresh(det.size(), false);

  if (compute_fp) {
    for (size_t j = 0; j < det.size(); j++)
      below_thresh[j] = det[j].score < thresh;
  }

  size_t gi = 0;
  vector<double> delta_angles;
  for (size_t i = 0; i < gt.size(); i++, gi++) {
    if (cl.ignored_gt[i] == -1) continue;

    int det_idx = -1;
    double best = NO_DETECTION;
    double max_ov = 0;
    bool matched_ignored = false;

    for (size_t j = 0; j < det.size(); j++) {
      if (cl.ignored_det[j] == -1 || assigned[j]) continue;
      if (compute_fp && below_thresh[j]) continue;

      double ov = overlap(metric, det[j], gt[i], -1);
      if (ov <= MIN_OVERLAP[cls]) continue;

      if (!compute_fp) {
        // Pass 1: prefer the highest-scoring overlapping detection
        if (det[j].score > best) {
          det_idx = (int)j;
          best = det[j].score;
        }
      } else if ((ov > max_ov || matched_ignored) &&
                 cl.ignored_det[j] == 0) {
        // Pass 2: prefer the best-overlap valid detection
        max_ov = ov;
        det_idx = (int)j;
        best = 1;
        matched_ignored = false;
      } else if (det_idx == -1 && cl.ignored_det[j] == 1) {
        det_idx = (int)j;
        best = 1;
        matched_ignored = true;
      }
    }

    if (best == NO_DETECTION && cl.ignored_gt[i] == 0) {
      st.fn++;
    } else if (best != NO_DETECTION &&
               (cl.ignored_gt[i] == 1 || cl.ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (best != NO_DETECTION) {
      st.tp++;
      st.tp_scores.push_back(det[det_idx].score);
      assigned[det_idx] = true;
      if (compute_aos)
        delta_angles.push_back(gt[i].alpha - det[det_idx].alpha);
    }
  }

  if (compute_fp) {
    for (size_t j = 0; j < det.size(); j++) {
      if (!(assigned[j] || cl.ignored_det[j] != 0 || below_thresh[j]))
        st.fp++;
    }
    // DontCare suppression: FP dets inside DontCare regions don't count
    int suppressed = 0;
    for (const Box &dc : cl.dontcare) {
      for (size_t j = 0; j < det.size(); j++) {
        if (assigned[j] || cl.ignored_det[j] != 0 || below_thresh[j])
          continue;
        if (overlap(metric, det[j], dc, 0) > MIN_OVERLAP[cls]) {
          assigned[j] = true;
          suppressed++;
        }
      }
    }
    st.fp -= suppressed;

    if (compute_aos) {
      // TPs contribute orientation similarity; FPs contribute 0
      for (double d : delta_angles)
        st.similarity += (1.0 + cos(d)) / 2.0;
    }
  }

  return st;
}

// ---------------------------------------------------------------------------
// Threshold selection at 41 recall sample points
// ---------------------------------------------------------------------------

static vector<double> get_thresholds(vector<double> scores, double n_gt) {
  vector<double> t;
  sort(scores.begin(), scores.end(), greater<double>());
  double current_recall = 0;
  for (size_t i = 0; i < scores.size(); i++) {
    double l_recall = (i + 1) / n_gt;
    double r_recall = (i < scores.size() - 1) ? (i + 2) / n_gt : l_recall;
    // Take this score only if the left recall is the closer sample; the
    // last TP score is always taken. current_recall advances on the fixed
    // 1/40 grid (NOT from l_recall) — protocol parity with the KITTI
    // devkit threshold selection.
    if (i < scores.size() - 1 &&
        (r_recall - current_recall) < (current_recall - l_recall))
      continue;
    t.push_back(scores[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

// ---------------------------------------------------------------------------
// Class/metric evaluation over all images
// ---------------------------------------------------------------------------

static bool eval_class(int cls, Metric metric,
                       const vector<vector<Box>> &gt_all,
                       const vector<vector<Box>> &det_all,
                       bool compute_aos,
                       vector<double> precision[3],
                       vector<double> aos[3]) {
  for (int d = 0; d < 3; d++) {
    precision[d].assign(N_SAMPLE_PTS, 0.0);
    aos[d].assign(N_SAMPLE_PTS, 0.0);

    // Per-image cleaning
    int n_gt_total = 0;
    vector<Cleaned> cleaned;
    cleaned.reserve(gt_all.size());
    for (size_t f = 0; f < gt_all.size(); f++) {
      cleaned.push_back(clean_data(cls, gt_all[f], det_all[f], d));
      n_gt_total += cleaned.back().n_gt;
    }
    if (n_gt_total == 0) continue;

    // Pass 1: collect TP scores over all images
    vector<double> tp_scores;
    for (size_t f = 0; f < gt_all.size(); f++) {
      Stats st = compute_statistics(cls, metric, gt_all[f], det_all[f],
                                    cleaned[f], false, 0.0, false);
      tp_scores.insert(tp_scores.end(), st.tp_scores.begin(),
                       st.tp_scores.end());
    }
    vector<double> thresholds = get_thresholds(tp_scores, n_gt_total);

    // Pass 2: tp/fp/fn at each threshold
    for (size_t t = 0; t < thresholds.size(); t++) {
      int tp = 0, fp = 0, fn = 0;
      double sim = 0;
      for (size_t f = 0; f < gt_all.size(); f++) {
        Stats st = compute_statistics(cls, metric, gt_all[f],
                                      det_all[f], cleaned[f], true,
                                      thresholds[t], compute_aos);
        tp += st.tp;
        fp += st.fp;
        fn += st.fn;
        sim += st.similarity;
      }
      if (tp + fp > 0) {
        precision[d][t] = (double)tp / (tp + fp);
        if (compute_aos) aos[d][t] = sim / (tp + fp);
      }
    }

    // Monotonize from the right
    for (int i = 0; i < N_SAMPLE_PTS; i++) {
      precision[d][i] = *max_element(precision[d].begin() + i,
                                     precision[d].end());
      if (compute_aos)
        aos[d][i] = *max_element(aos[d].begin() + i, aos[d].end());
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Output
// ---------------------------------------------------------------------------

static void save_curve(const string &plot_dir, const string &name,
                       vector<double> vals[3]) {
  string path = plot_dir + "/" + name + ".txt";
  FILE *fp = fopen(path.c_str(), "w");
  if (fp) {
    for (int i = 0; i < N_SAMPLE_PTS; i++)
      fprintf(fp, "%f %f %f %f\n", (double)i / (N_SAMPLE_PTS - 1.0),
              vals[0][i], vals[1][i], vals[2][i]);
    fclose(fp);
  }
  // 11-point AP: every 4th of the 41 recall samples
  double sum[3] = {0, 0, 0};
  for (int d = 0; d < 3; d++)
    for (int i = 0; i < N_SAMPLE_PTS; i += 4) sum[d] += vals[d][i];
  printf("%s AP: %f %f %f\n", name.c_str(), sum[0] / 11 * 100,
         sum[1] / 11 * 100, sum[2] / 11 * 100);
}

static void save_stats(const string &result_dir, const string &name,
                       vector<double> vals[3]) {
  FILE *fp = fopen((result_dir + "/stats_" + name + ".txt").c_str(), "w");
  if (!fp) return;
  for (int d = 0; d < 3; d++) {
    for (int i = 0; i < N_SAMPLE_PTS; i++)
      fprintf(fp, "%f ", vals[d][i]);
    fprintf(fp, "\n");
  }
  fclose(fp);
}

// ---------------------------------------------------------------------------

int main(int argc, char **argv) {
  if (argc < 3) {
    printf("Usage: %s gt_dir result_dir [low]\n", argv[0]);
    return 1;
  }
  string gt_dir = argv[1];
  string result_dir = argv[2];
  bool low_iou = (argc > 3 && strcmp(argv[3], "low") == 0);

  if (low_iou) {
    MIN_OVERLAP[0] = 0.5;
    MIN_OVERLAP[1] = 0.25;
    MIN_OVERLAP[2] = 0.25;
  } else {
    MIN_OVERLAP[0] = 0.7;
    MIN_OVERLAP[1] = 0.5;
    MIN_OVERLAP[2] = 0.5;
  }

  string data_dir = result_dir + "/data";
  DIR *dir = opendir(data_dir.c_str());
  if (!dir) {
    printf("ERROR: cannot open %s\n", data_dir.c_str());
    return 1;
  }

  vector<string> names;
  struct dirent *ent;
  while ((ent = readdir(dir)) != nullptr) {
    string fname = ent->d_name;
    if (fname.size() > 4 &&
        fname.substr(fname.size() - 4) == ".txt")
      names.push_back(fname.substr(0, fname.size() - 4));
  }
  closedir(dir);
  sort(names.begin(), names.end());

  vector<vector<Box>> gt_all, det_all;
  bool have_alpha = true;
  vector<int> class_present(NUM_CLASSES, 0);

  for (const string &name : names) {
    vector<Box> gt, det;
    if (!read_label_file(gt_dir + "/" + name + ".txt", false, &gt)) {
      printf("ERROR: missing ground truth %s.txt\n", name.c_str());
      return 1;
    }
    read_label_file(data_dir + "/" + name + ".txt", true, &det);
    for (const Box &d : det) {
      if (d.alpha == -10) have_alpha = false;
      for (int c = 0; c < NUM_CLASSES; c++)
        if (d.type == CLASS_NAMES[c]) class_present[c] = 1;
    }
    gt_all.push_back(gt);
    det_all.push_back(det);
  }
  printf("Loaded %zu images\n", names.size());

  string plot_dir = result_dir + "/plot";
  mkdir(plot_dir.c_str(), 0755);

  for (int c = 0; c < NUM_CLASSES; c++) {
    if (!class_present[c]) continue;
    vector<double> precision[3], aos[3];

    // Image-space detection (+ AOS)
    eval_class(c, IMAGE, gt_all, det_all, have_alpha, precision, aos);
    save_curve(plot_dir, string(CLASS_NAMES[c]) + "_detection",
               precision);
    save_stats(result_dir, string(CLASS_NAMES[c]) + "_detection",
               precision);
    if (have_alpha) {
      save_curve(plot_dir, string(CLASS_NAMES[c]) + "_orientation", aos);
      save_stats(result_dir, string(CLASS_NAMES[c]) + "_orientation",
                 aos);
    }

    // Bird's-eye view
    eval_class(c, GROUND, gt_all, det_all, false, precision, aos);
    save_curve(plot_dir, string(CLASS_NAMES[c]) + "_detection_BEV",
               precision);
    save_stats(result_dir, string(CLASS_NAMES[c]) + "_detection_ground",
               precision);

    // Full 3D
    eval_class(c, BOX3D, gt_all, det_all, false, precision, aos);
    save_curve(plot_dir, string(CLASS_NAMES[c]) + "_detection_3D",
               precision);
    save_stats(result_dir, string(CLASS_NAMES[c]) + "_detection_3d",
               precision);
  }

  printf("Done.\n");
  return 0;
}
