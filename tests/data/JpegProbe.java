import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;

public class JpegProbe {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("decode")) {
            // decode JPEG -> raw gray (or raw RGB) dump
            BufferedImage img = ImageIO.read(new File(args[1]));
            if (img == null) { System.err.println("NOT DECODABLE"); System.exit(2); }
            Raster r = img.getRaster();
            int w = img.getWidth(), h = img.getHeight();
            int bands = r.getNumBands();
            DataOutputStream out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(args[2])));
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int b = 0; b < bands; b++)
                        out.writeByte(r.getSample(x, y, b));
            out.close();
            System.out.println(w + " " + h + " " + bands);
        } else if (args[0].equals("encode")) {
            // encode raw gray dump (w h from args) -> JPEG
            int w = Integer.parseInt(args[3]), h = Integer.parseInt(args[4]);
            byte[] raw = new FileInputStream(args[1]).readAllBytes();
            BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    img.getRaster().setSample(x, y, 0, raw[y * w + x] & 0xff);
            ImageIO.write(img, "jpg", new File(args[2]));
            System.out.println("wrote " + args[2]);
        }
    }
}
