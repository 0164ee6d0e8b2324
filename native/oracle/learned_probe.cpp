// Probe tool for LearningBasedWB: dumps extractSimpleFeatures output and
// the applied per-channel gains (solved from input/output) for an image.
#include <cstdio>
#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/xphoto/white_balance.hpp>

int main(int argc, char** argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s <in.png> [thr]\n", argv[0]); return 2; }
    cv::Mat img = cv::imread(argv[1], cv::IMREAD_COLOR);
    auto wb = cv::xphoto::createLearningBasedWB("");
    if (argc > 2) wb->setSaturationThreshold((float)std::atof(argv[2]));
    cv::Mat feat;
    wb->extractSimpleFeatures(img, feat);
    std::printf("features %d x %d type %d\n", feat.rows, feat.cols, feat.type());
    for (int i = 0; i < (int)feat.total(); i++) {
        cv::Vec2f v = feat.at<cv::Vec2f>(i);
        std::printf("f%d %.9g %.9g\n", i, v[0], v[1]);
    }
    cv::Mat out;
    wb->balanceWhite(img, out);
    // solve gains per channel by least squares on unsaturated pixels
    for (int c = 0; c < 3; c++) {
        double num = 0, den = 0;
        for (int y = 0; y < img.rows; y++)
            for (int x = 0; x < img.cols; x++) {
                int vi = img.at<cv::Vec3b>(y, x)[c];
                int vo = out.at<cv::Vec3b>(y, x)[c];
                if (vo > 5 && vo < 250) { num += (double)vi * vo; den += (double)vi * vi; }
            }
        std::printf("gain%d %.9g\n", c, den > 0 ? num / den : -1.0);
    }
    return 0;
}
