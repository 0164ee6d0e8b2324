// Direct black-box access to LearningBasedWBImpl::predictIlluminant via the
// static lib. Reads feature quadruples (8 floats per line) from stdin and
// prints the (u,v) prediction per line.
#include <cstdio>
#include <vector>
#include <opencv2/core.hpp>
#include <opencv2/xphoto/white_balance.hpp>

namespace cv { namespace xphoto {
class LearningBasedWBImpl {
  public:
    Vec2f predictIlluminant(std::vector<Vec2f> features);
};
}}

int main() {
    auto wb = cv::xphoto::createLearningBasedWB("");
    auto* impl = reinterpret_cast<cv::xphoto::LearningBasedWBImpl*>(wb.get());
    float a, b, c, d, e, f, g, h;
    while (std::scanf("%f %f %f %f %f %f %f %f", &a, &b, &c, &d, &e, &f, &g, &h) == 8) {
        std::vector<cv::Vec2f> feat = {{a, b}, {c, d}, {e, f}, {g, h}};
        cv::Vec2f p = impl->predictIlluminant(feat);
        std::printf("%.9g %.9g\n", p[0], p[1]);
    }
    return 0;
}
