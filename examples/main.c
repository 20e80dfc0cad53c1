/* Pure-C chat client for libminigpt4.so — the examples/main.cpp analogue
 * (reference: /root/reference/examples/main.cpp).  Demonstrates the ABI from
 * a non-Python host: load -> encode (preprocessed f32 image from stdin or
 * zeros) -> system prompt -> one question -> streamed greedy decode.
 *
 * Build:
 *   gcc examples/main.c -Iminigpt4_tpu/c_api -Lbuild_capi -lminigpt4 -o main_c
 * Run (the embedded interpreter must find the package + venv):
 *   PYTHONPATH=/root/repo:/opt/venv/lib/python3.12/site-packages \
 *   LD_LIBRARY_PATH=build_capi ./main_c model.bin llm.bin [image_size] [max_tokens]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "minigpt4.h"

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <model.bin> <llm.bin> [image_size] [max_tokens]\n", argv[0]);
        return 2;
    }
    int image_size = argc > 3 ? atoi(argv[3]) : 224;
    int max_tokens = argc > 4 ? atoi(argv[4]) : 16;

    struct MiniGPT4Context *ctx =
        minigpt4_model_load(argv[1], argv[2], MINIGPT4_VERBOSITY_ERROR, 1337, 512, 64, false);
    if (!ctx) {
        fprintf(stderr, "model load failed\n");
        return 1;
    }

    size_t n = (size_t)3 * image_size * image_size;
    float *pixels = calloc(n, sizeof(float));
    struct MiniGPT4Image image = {pixels, image_size, image_size, 3, MINIGPT4_IMAGE_FORMAT_F32};
    struct MiniGPT4Embedding embedding = {0};
    int rc = minigpt4_encode_image(ctx, &image, &embedding, 0);
    if (rc != 0) {
        fprintf(stderr, "encode failed: %s\n", minigpt4_error_code_to_string(rc));
        return 1;
    }
    printf("encoded image -> %zu floats\n", embedding.elements);

    if ((rc = minigpt4_system_prompt(ctx, 0)) != 0 ||
        (rc = minigpt4_begin_chat_image(ctx, &embedding, "what is this?", 0)) != 0) {
        fprintf(stderr, "prompt failed: %s\n", minigpt4_error_code_to_string(rc));
        return 1;
    }

    char chat[4096] = {0};
    const char *token = NULL;
    for (int i = 0; i < max_tokens; i++) {
        rc = minigpt4_end_chat_image(ctx, &token, 0, /*temp=*/0.0f, 40, 0.9f, 1.0f, 1.0f, 64, 1.1f,
                                     1.0f, 1.0f, 0, 5.0f, 1.0f, 1);
        if (rc != 0) {
            fprintf(stderr, "decode failed: %s\n", minigpt4_error_code_to_string(rc));
            return 1;
        }
        strncat(chat, token, sizeof(chat) - strlen(chat) - 1);
        if (minigpt4_contains_eos_token(token)) continue;
        if (minigpt4_is_eos(chat)) break;
        printf("%s", token);
        fflush(stdout);
    }
    printf("\n[done]\n");

    minigpt4_free_embedding(&embedding);
    free(pixels);
    minigpt4_free(ctx);
    return 0;
}
